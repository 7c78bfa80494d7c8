"""Scalar function surface (SURVEY.md §2.6/§2.9).

Pure Python functions live here and are shared verbatim by the Spark
pandas-UDF path and the pure-Python oracle — this is what makes the
per-row invariants (byte-identical extracted text, identical canonical
URLs) hold by construction.
"""

from ethereum_raw_data_crawler_spark.functions.urls import (  # noqa: F401
    canonicalize_url,
    url_hash64,
    host_of,
)
from ethereum_raw_data_crawler_spark.functions.extract import (  # noqa: F401
    extract_text,
    extract_links,
)
