"""Input connectors: pages table, extraction-target CSV, media/embeddings."""

from ocr_parallel_spark.sources.readers import (  # noqa: F401
    read_embeddings,
    read_pages,
    read_targets_csv,
)
from ocr_parallel_spark.sources.warc import (  # noqa: F401
    read_warc,
    warc_docs,
    warc_pages,
)
