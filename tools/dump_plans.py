"""Dump formatted physical plans for the headline queries (plan-review
evidence for docs/SCALE.md).  Usage: PYTHONPATH=. python tools/dump_plans.py [sf_dir]"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssafynews_data_spark import get_session, registry


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    qs = registry.load_all()
    spark = get_session(app_name="dump_plans")
    for name, q in sorted(qs.items()):
        if not q.bench:
            continue
        print(f"===== {name} =====")
        qs[name].fn(spark, sf_dir).explain("formatted")
    return 0


if __name__ == "__main__":
    sys.exit(main())
