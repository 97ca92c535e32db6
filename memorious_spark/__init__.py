"""memorious_spark: a PySpark-native distributed crawl-frontier engine
with the capabilities of alephdata/memorious (reference read-only at
/root/reference), re-expressed as batched DataFrame frontier rounds
over a Common-Crawl-style page corpus. See SURVEY.md for the blueprint.
"""

__version__ = "0.1.0"
