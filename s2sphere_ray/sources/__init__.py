"""Source/sink widening beyond Parquet (E0).

Parquet is the scale format every registered pipeline reads; this
package adds the interchange formats a web-text curation stack meets at
its edges: ``jsonl`` — newline-delimited JSON corpus shards (crawl
dumps, filtered-shard hand-offs, eval sets) — ``csv`` — flat
label/metadata tables — and ``ipc`` — Arrow IPC (Feather V2), the
full-fidelity zero-parse hand-off between Arrow-native pipelines.  All
sinks share one manifested, resumable, id-hash-bucketed partition
contract (``_partsink``).
"""

from .csv import read_csv, write_csv  # noqa: F401
from .ipc import read_ipc, write_ipc  # noqa: F401
from .jsonl import read_jsonl, write_jsonl  # noqa: F401
