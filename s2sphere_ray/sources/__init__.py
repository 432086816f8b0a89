"""Source/sink widening beyond Parquet (E0).

Parquet is the scale format every registered pipeline reads; this
package adds the interchange formats a web-text curation stack meets at
its edges.  ``jsonl`` — newline-delimited JSON corpus shards — is the
first: crawl dumps, filtered-shard hand-offs and eval sets all travel
as JSONL.
"""

from .jsonl import read_jsonl, write_jsonl  # noqa: F401
