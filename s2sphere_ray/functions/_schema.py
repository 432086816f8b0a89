"""Block-schema stabilization for shuffle-produced Datasets.

Ray's shuffle ops (sort-based groupby reduce, hash shuffle) emit 0-row
blocks with an EMPTY schema for partitions that received no rows — the
group UDF is never invoked for them, so nothing declares their schema.
Worse, ``map_batches`` CANNOT heal them: a map task whose entire input
bundle is empty never calls the UDF and re-emits a schema-less block
(verified empirically on Ray 2.49; a normalizer UDF is dead code for
exactly the blocks it targets), and even ``groupby().aggregate(...)``
emits one schema-less block per empty partition.

Downstream, Ray's native ``Dataset.join`` breaks on these: the
hash-shuffle operator broadcasts each input's schema via the FIRST block
of that input, but when that block has 0 rows ``_shuffle_block`` returns
before broadcasting while the has-broadcast flag is still set
(``hash_shuffle.py:224,584-589``) — so the schema is never disseminated
and every join partition that receives no real rows for that input
finalizes against a schema-less table: ``ArrowInvalid: No match ... for
key field FieldRef``.  This reproduces deterministically at
``num_cpus=32`` and is invisible at low parallelism.

The one transform that DOES heal blocks is ``repartition(n)``: it
rebuilds blocks from row ranges, so 0-row inputs contribute nothing and
every output block is typed and non-empty — provided ``n <= num_rows``.
Hence the helper below: materialize (a barrier, so use it only on
COMPACT streams like candidate-pair tables — never the corpus; for
corpus-sized sides avoid ``Dataset.join`` entirely, see
``stages.join.anti_join_drop_ids``), count, then repartition to a
data-proportional block count capped at the row count.
"""

from __future__ import annotations

import pyarrow as pa


def stabilize_schema(ds, schema: pa.Schema, *, target_rows: int = 250_000):
    """Return ``ds`` with every block typed and non-empty (schema healed).

    Materializes ``ds`` (only call on compact streams — id pairs, keys,
    aggregates), then repartitions to ``min(derived_buckets, num_rows)``
    blocks so no output block is empty.  A fully empty input becomes a
    single-block typed empty Dataset with exactly ``schema``.
    """
    import ray.data as rd

    from ._buckets import derive_buckets

    m = ds.materialize()
    n = m.count()
    if n == 0:
        return rd.from_arrow(schema.empty_table())
    return m.repartition(min(derive_buckets(n, target_rows=target_rows), n))


PAIR_SCHEMA = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])


def concat_blocks(ds, schema: pa.Schema) -> pa.Table:
    """Gather a COMPACT Dataset to one Arrow table — typed column-block
    concat, never per-row python (``take_all()``'s row dicts were the
    round-4 review's driver-gather anti-pattern).  Schema-less 0-row
    shuffle blocks are dropped; a fully empty input yields ``schema``'s
    empty table."""
    import ray as _ray

    tabs = [
        t.select(schema.names)
        for t in _ray.get(ds.to_arrow_refs())
        if t.num_rows
    ]
    if not tabs:
        return schema.empty_table()
    return pa.concat_tables(tabs).combine_chunks()
