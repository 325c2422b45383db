"""Corpus-curation composite — the end-to-end training-data pipeline
(the north-star workload): quality filter → language filter → exact
dedup → deterministic train/test split, as one lazy DataFrame chain.

Each stage is an operator from the library; the composite exists to
prove they compose without materialization barriers (one scan, one
shuffle for the dedup aggregate) and to give the driver an oracle over
the whole chain rather than stage-by-stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ssafynews_data_spark.operators.sampling import train_test_split
from ssafynews_data_spark.operators.text import _DUCK_BIGRAM_REP, bigram_repetition_q4
from ssafynews_data_spark.registry import register
from ssafynews_data_spark.sources.readers import load_table

MIN_CHARS = 100
LANGS = ("en", "de", "fr")
#: max repeated-bigram fraction (floor-quantized 4dp): the C4/Gopher-
#: style repetition gate, applied row-locally BEFORE the dedup shuffle.
MAX_BIGRAM_REP_Q4 = 3000


def curate(docs: DataFrame, keep: tuple[str, ...] | None = None) -> DataFrame:
    """documents → curated training rows.

    Stage order matters at scale: cheap row-local predicates (length,
    lang) run FIRST so the dedup shuffle only carries survivors; the
    split adds no shuffle at all (hash expression).

    ``keep`` (optional, must lead with ``doc_id``) projects the row
    down to just those columns BEFORE the dedup exchange — guide §2.3,
    shuffle fewer bytes: an aggregate consumer (``curate_corpus``)
    needs only (doc_id, lang), so carrying ``text`` through the
    shuffle inside the argmin struct was pure dead weight.  Result-
    identical because ``doc_id`` is unique and leads the struct
    comparison: the winning row per fingerprint cannot change, only
    which columns of it ride along.
    """
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), "[\\s\\x0B]+", " "))
    filtered = docs.filter(
        (F.col("n_chars") >= MIN_CHARS)
        & F.col("lang").isin(*LANGS)
        & (bigram_repetition_q4(F.col("text")) < MAX_BIGRAM_REP_Q4)
    ).withColumn("fp", F.md5(norm.cast("binary")))
    if keep is not None:
        filtered = filtered.select("fp", *keep)
    # keep-first as ONE argmin aggregate: min(struct(doc_id, ...)) picks
    # the min-doc_id row per fingerprint (struct compares field-by-field,
    # doc_id leads).  vs the agg + semi-join form this halves the work —
    # no second evaluation of the filter/tokenize lineage and no join;
    # map-side partial min means the shuffle carries one row per
    # distinct fingerprint per partition.
    cols = [c for c in filtered.columns if c != "fp"]
    assert cols[0] == "doc_id"  # struct-min must order by doc_id first
    keep = (
        filtered.groupBy("fp")
        .agg(F.min(F.struct(*cols)).alias("_k"))
        .select("_k.*")
    )
    return train_test_split(keep, "doc_id")


@register(
    "curate_corpus",
    oracle=f"""
        WITH filtered AS (
            SELECT doc_id, lang,
                   md5(trim(regexp_replace(lower(text), '[\\s\\x0B]+', ' ', 'g'), ' ')) AS fp
            FROM documents
            WHERE n_chars >= 100 AND lang IN ('en', 'de', 'fr')
              AND ({_DUCK_BIGRAM_REP}) < 3000
        ),
        keepers AS (SELECT min(doc_id) AS doc_id FROM filtered GROUP BY fp),
        deduped AS (SELECT f.* FROM filtered f JOIN keepers USING (doc_id)),
        split AS (
            SELECT doc_id, lang,
                   CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                             AS BIGINT) % 100 < 20
                        THEN 'test' ELSE 'train' END AS split
            FROM deduped
        )
        SELECT lang, split, count(*) AS n, min(doc_id) AS min_id
        FROM split GROUP BY lang, split
    """,
    tags=("composite", "curate", "north-star"),
    bench=True,
)
def curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole curation chain under one oracle: per-(lang, split)
    counts of the quality-filtered, deduped, split corpus."""
    docs = load_table(spark, sf_dir, "documents")
    out = curate(docs, keep=("doc_id", "lang"))
    return out.groupBy("lang", "split").agg(
        F.count("*").alias("n"), F.min("doc_id").alias("min_id")
    )
