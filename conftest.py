"""Repo-root conftest so tests import the package from the source tree."""
