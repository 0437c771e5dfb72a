"""Partitioned hash join for LARGE x LARGE equi-joins.

The repo's other joins broadcast the small side (``ray.put`` once, probe
inside ``map_batches``) — the right call whenever one side fits the
object store.  When BOTH sides are corpus-scale, the classic shape is a
co-partitioned hash join: hash both sides on the join key into the same
bucket space, join each bucket independently.  Built on
``state.partitioning.join_exchange`` (raw tasks — the tier-(c) escape
hatch documented there; Ray Data has no native join and its groupby
carries the measured ~8 s sort-shuffle floor), with the per-bucket join
done by ``pyarrow.Table.join`` (Acero's vectorized hash join).

Partitioning assumption (documented per the join_exchange contract):
keys are hashed with the shared splitmix64/vhash core, so equal keys —
int64 or string — always land in the same bucket; per-bucket memory is
the bucket's share of both sides, so ``n_buckets`` must be sized to
(total size) / (worker heap), and a single pathologically hot key that
exceeds one bucket needs upstream salting (state/partitioning has the
machinery; same caveat as the as-of join documents).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from json_remedy_ray.functions.vhash import _mix64, hash_strings
from json_remedy_ray.state.partitioning import join_exchange, partition_by_bucket


def _key_buckets(tbl: pa.Table, key: str, n_buckets: int) -> np.ndarray:
    col = tbl[key]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        # fill_null first: to_numpy on a null-bearing int array silently
        # promotes to float64, and .view would then hash float bit
        # patterns — breaking co-partitioning vs null-free blocks.  Null
        # keys never match in the per-bucket join; they just need a
        # consistent bucket.
        ints = col.cast(pa.int64())
        if ints.null_count:
            ints = pc.fill_null(ints, 0)
        h = _mix64(ints.to_numpy(zero_copy_only=False).view(np.uint64))
    else:
        h = hash_strings(col)
    return (h % np.uint64(n_buckets)).view(np.int64)


def hash_join(left: rd.Dataset, right: rd.Dataset,
              left_on: str | list[str], right_on: str | list[str],
              how: str = "inner", n_buckets: int = 32) -> rd.Dataset:
    """Equi-join two Datasets without broadcasting either side.  ``how``
    is any join type pyarrow.Table.join supports ("inner",
    "left outer", "right outer", "full outer", "left semi",
    "left anti", ...).  Composite keys are allowed; rows are
    co-partitioned on the FIRST key (equal composite keys always agree
    on it) and the per-bucket join matches the full key list."""
    lkeys = [left_on] if isinstance(left_on, str) else list(left_on)
    rkeys = [right_on] if isinstance(right_on, str) else list(right_on)

    def part_side(key: str):
        def part(tbl: pa.Table) -> list[pa.Table]:
            # empty blocks can surface with a pre-map schema (observed on
            # union datasets); zero-row slices are dropped by the reduce
            if tbl.num_rows == 0 or key not in tbl.schema.names:
                return [tbl.slice(0, 0)] * n_buckets
            b = _key_buckets(tbl, key, n_buckets)
            tbl = tbl.append_column("__bucket", pa.array(b))
            out = partition_by_bucket(tbl, "__bucket", n_buckets)
            return [t.drop_columns(["__bucket"]) for t in out]
        return part

    # driver-side schemas let a bucket whose only blocks were the
    # wrong-schema empties still produce a consistently-typed result
    ls, rs = left.schema(), right.schema()
    l_empty = pa.schema(list(zip(ls.names, ls.types))).empty_table()
    r_empty = pa.schema(list(zip(rs.names, rs.types))).empty_table()

    def reduce_join(left_tabs, right_tabs) -> pa.Table:
        lts = [t for t in left_tabs if lkeys[0] in t.schema.names] or [l_empty]
        rts = [t for t in right_tabs if rkeys[0] in t.schema.names] or [r_empty]
        lt = pa.concat_tables(lts, promote_options="none")
        rt = pa.concat_tables(rts, promote_options="none")
        return lt.join(rt, keys=lkeys, right_keys=rkeys, join_type=how)

    reduced = join_exchange(left.to_arrow_refs(), right.to_arrow_refs(),
                            n_buckets, part_side(lkeys[0]),
                            part_side(rkeys[0]), reduce_join)
    return rd.from_arrow_refs(reduced)
