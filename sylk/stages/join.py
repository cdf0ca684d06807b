"""Relational join operators (star-schema enrich, fact-fact join,
semi/anti join) — Ray-Data-first.

The reference crate has no joins (one string -> struct function); these
are engine capabilities a training-data pipeline needs (dim enrich,
fact-to-fact correlation, "rows without a match" filtering).  Three
shapes, chosen by side sizes:

* :func:`broadcast_join` — the small side is ``ray.put`` ONCE as an
  Arrow table and every block hash-joins against it in pyarrow C++
  (zero shuffle of the fact side).  The 100-TB default for star-schema
  dims: the dim must fit in a worker heap (nation/region always;
  customer only at sandbox scale — documented per query).
* :func:`hash_join` — both sides large: ``Dataset.join`` (hash
  partition both inputs on the key, join per partition).  One
  all-to-all exchange per side; ``num_partitions`` defaults to the
  cluster CPU count, at real scale pass blocks-per-node x nodes.
* :func:`semi_join` / :func:`anti_join` — tiered like the dedup
  verification paths: below ``_DRIVER_KEY_LIMIT`` distinct right keys,
  a broadcast key-set filter (``pyarrow.compute.is_in`` per block, no
  shuffle at all); above it, ``Dataset.join`` ``left_semi`` /
  ``left_anti`` (``distributed=True`` forces, equivalence is tested in
  tests/test_join.py).

Aggregation after a join uses :func:`grouped_agg` — per-block pyarrow
``group_by`` partials (combiner) then one small ``groupby`` of the
partials, the same two-phase shape as ``sylk.stages.aggregate``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# below this many DISTINCT right-side keys, semi/anti joins broadcast
# the key set instead of shuffling the left side.
_DRIVER_KEY_LIMIT = 5_000_000


def _patch_hash_shuffle_schema_broadcast() -> None:
    """Work around a Ray 2.49 hash-shuffle bug: the operator broadcasts
    the input schema to all aggregators only with the FIRST block of
    each input sequence (``_has_schemas_broadcasted``), but
    ``_shuffle_block`` returns early for 0-row blocks WITHOUT sending
    anything — so when the first block happens to be empty (a seed
    union, a filter that emptied a block, a map task that yielded
    nothing), partitions that receive no rows finalize a ZERO-COLUMN
    table and ``pyarrow.Table.join`` dies with ArrowInvalid
    "No match ... FieldRef.Name(<key>)".

    Fix: drop 0-row blocks from each input bundle before the operator
    sees them, so the first block it processes (and broadcasts schema
    from) is always non-empty.  Idempotent; driver-side only."""
    from ray.data._internal.execution.interfaces.ref_bundle import RefBundle
    from ray.data._internal.execution.operators import hash_shuffle as _hs

    cls = _hs.HashShufflingOperatorBase
    if getattr(cls, "_sylk_schema_broadcast_patch", False):
        return
    orig = cls._do_add_input_inner

    def _patched(self, input_bundle, input_index):
        pairs = [(r, m) for r, m in zip(input_bundle.block_refs,
                                        input_bundle.metadata)
                 if m.num_rows is None or m.num_rows > 0]
        if len(pairs) < len(input_bundle.block_refs):
            if not pairs:
                return None
            input_bundle = RefBundle(tuple(pairs),
                                     owns_blocks=input_bundle.owns_blocks,
                                     schema=input_bundle.schema)
        return orig(self, input_bundle, input_index)

    cls._do_add_input_inner = _patched
    cls._sylk_schema_broadcast_patch = True


_patch_hash_shuffle_schema_broadcast()


def _default_partitions() -> int:
    import ray

    return max(2, int(ray.cluster_resources().get("CPU", 8)))


def broadcast_join(fact_ds, dim: pa.Table, on, right_on=None,
                   join_type: str = "inner"):
    """Join a streaming fact Dataset against a broadcast dim table.

    ``dim`` is placed in the object store once; each block joins
    zero-copy via pyarrow's C++ hash join.  No fact-side shuffle."""
    import ray

    on = list(on) if not isinstance(on, str) else [on]
    right_on = (list(right_on) if not isinstance(right_on, str) else [right_on]) \
        if right_on is not None else on
    ref = ray.put(dim)

    def _j(b: pa.Table) -> pa.Table:
        d = ray.get(ref)
        return b.join(d, keys=on, right_keys=right_on, join_type=join_type)

    return fact_ds.map_batches(_j, batch_format="pyarrow", batch_size=None,
                               zero_copy_batch=True)


def cross_join(left_ds, right: pa.Table):
    """CROSS JOIN a streaming Dataset against a broadcast small side:
    each left block is index-repeated against the tiled right table —
    pure per-block compute, no shuffle.  The small side rides the
    object store once (``ray.put``); output volume is |left| x |right|
    rows, so the right side MUST be dimension-sized (grids, calendars,
    parameter sweeps) — that is the only cross join with a sane 100-TB
    shape, and the one SQL engines broadcast too."""
    import ray

    ref = ray.put(right)

    def _x(b: pa.Table) -> pa.Table:
        d = ray.get(ref)
        overlap = set(b.column_names) & set(d.column_names)
        if overlap:
            # dict-union output would silently overwrite the left column
            raise ValueError(
                f"cross_join: overlapping column names {sorted(overlap)}; "
                "rename one side before joining")
        nl, nr = len(b), len(d)
        if nl == 0 or nr == 0:
            return pa.table({**{c: b.column(c).slice(0, 0) for c in b.column_names},
                             **{c: d.column(c).slice(0, 0) for c in d.column_names}})
        li = pa.array(np.repeat(np.arange(nl, dtype=np.int64), nr))
        ri = pa.array(np.tile(np.arange(nr, dtype=np.int64), nl))
        lt, rt = b.take(li), d.take(ri)
        return pa.table({**{c: lt.column(c) for c in lt.column_names},
                         **{c: rt.column(c) for c in rt.column_names}})

    return left_ds.map_batches(_x, batch_format="pyarrow", batch_size=None,
                               zero_copy_batch=True)


_JOIN_PARTITION_BYTES = 256 << 20  # target per-partition input


def _size_based_partitions(left_ds, right_ds) -> int:
    """Partition count for Dataset.join: scale with DATA (one partition
    per ~256 MiB of joined input, estimated from parquet metadata /
    block metadata without executing), clamped to [2, 2 x cluster CPUs].
    Each partition costs a shuffle-aggregator task and actor startup, so
    tiny inputs must not pay for 32 of them; huge inputs cap at 2 x CPUs
    and grow per-partition size instead (use partition_size_hint /
    more nodes beyond that)."""
    import math

    try:
        total = (left_ds.size_bytes() or 0) + (right_ds.size_bytes() or 0)
    except Exception:
        total = 0
    if not total:
        return _default_partitions()
    want = math.ceil(total / _JOIN_PARTITION_BYTES)
    return max(2, min(want, 2 * _default_partitions()))


def _strip_schema_metadata(b: pa.Table) -> pa.Table:
    # pandas-born schema metadata confuses Ray's shuffle schema dedup;
    # drop it (zero-copy).
    return b.replace_schema_metadata(None) if b.schema.metadata else b


def _sane_blocks(b: pa.Table):
    # Two hash-shuffle poisons, scrubbed at every join boundary (in AND
    # out): (1) blocks born from pandas carry a schema-metadata dict that
    # Ray's shuffle schema dedup can't hash (warns per block) — drop it
    # (zero-copy); (2) Ray's join finalize emits ZERO-COLUMN empty blocks
    # for partitions that received no rows, and a later pyarrow join
    # can't resolve its key fields against that empty schema
    # (ArrowInvalid "No match ... FieldRef") — drop such blocks entirely
    # (a generator UDF may yield nothing for a block).
    if b.num_columns:
        yield b.replace_schema_metadata(None) if b.schema.metadata else b


def hash_join(left_ds, right_ds, on, right_on=None, join_type: str = "inner",
              num_partitions: int | None = None):
    """Distributed hash join (both sides large): partition both inputs
    on the key, join per partition (``Dataset.join``)."""
    if num_partitions is None:
        num_partitions = _size_based_partitions(left_ds, right_ds)
    left_ds = left_ds.map_batches(_sane_blocks,
                                  batch_format="pyarrow", batch_size=None,
                                  zero_copy_batch=True)
    right_ds = right_ds.map_batches(_sane_blocks,
                                    batch_format="pyarrow", batch_size=None,
                                    zero_copy_batch=True)
    on = (on,) if isinstance(on, str) else tuple(on)
    right_on = ((right_on,) if isinstance(right_on, str) else tuple(right_on)) \
        if right_on is not None else on
    joined = left_ds.join(right_ds, join_type, num_partitions,
                          on=on, right_on=right_on)
    return joined.map_batches(_sane_blocks, batch_format="pyarrow",
                              batch_size=None, zero_copy_batch=True)


def _semi_anti(left_ds, right_ds, on: str, right_key: str, anti: bool,
               distributed: bool | None = None,
               num_partitions: int | None = None):
    import ray

    # `Dataset.unique` materializes the distinct key list on the driver,
    # so the tier DECISION must be bounded too: probe the right-side ROW
    # count first (distinct keys <= rows, and count() is metadata-cheap)
    # and only collect keys when rows are under the limit.  Forced or
    # over-limit inputs take the native left_semi/left_anti Dataset.join.
    if distributed is None:
        distributed = right_ds.count() > _DRIVER_KEY_LIMIT
    if distributed:
        jt = "left_anti" if anti else "left_semi"
        return hash_join(left_ds, right_ds.select_columns([right_key]),
                         on=(on,), right_on=(right_key,), join_type=jt,
                         num_partitions=num_partitions)
    key_list = right_ds.select_columns([right_key]).unique(right_key)
    # SQL semi/anti semantics: a NULL right key never matches, so drop
    # Nones before sorting (mixed None/int would also crash sorted());
    # pc.is_in already treats left NULLs as non-members.
    # Dataset.unique returns None (not []) on an empty input
    keys = sorted(k for k in (key_list or []) if k is not None)
    if not keys:
        return left_ds if anti else left_ds.limit(0)
    ref = ray.put(pa.array(keys))

    def _filt(b: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        mask = pc.is_in(b.column(on), value_set=ks)
        if anti:
            mask = pc.invert(mask)
        return b.filter(mask)

    return left_ds.map_batches(_filt, batch_format="pyarrow", batch_size=None,
                               zero_copy_batch=True)


def semi_join(left_ds, right_ds, on: str, right_key: str | None = None,
              distributed: bool | None = None,
              num_partitions: int | None = None):
    """Rows of ``left_ds`` whose ``on`` key appears in ``right_ds``."""
    return _semi_anti(left_ds, right_ds, on, right_key or on, anti=False,
                      distributed=distributed, num_partitions=num_partitions)


def anti_join(left_ds, right_ds, on: str, right_key: str | None = None,
              distributed: bool | None = None,
              num_partitions: int | None = None):
    """Rows of ``left_ds`` whose ``on`` key does NOT appear in ``right_ds``."""
    return _semi_anti(left_ds, right_ds, on, right_key or on, anti=True,
                      distributed=distributed, num_partitions=num_partitions)


# --- post-join aggregation (two-phase) --------------------------------------

def cents_column(batch: pa.Table, out: str, expr_cols, fn) -> pa.Table:
    """Append an exact int64 money column: ``fn(*cols)`` must produce the
    scaled double; the half-up rounding (floor(x + 0.5)) matches the SQL
    ``CAST(FLOOR(x + 0.5) AS BIGINT)`` bit-for-bit (same IEEE ops in the
    same order — no round-half-even divergence)."""
    arrs = [batch.column(c).to_numpy(zero_copy_only=False) for c in expr_cols]
    x = fn(*arrs)
    return batch.append_column(out, pa.array(np.floor(x + 0.5).astype(np.int64)))


def grouped_agg(ds, keys, sum_cols, count_name: str = "n"):
    """Two-phase grouped count+sums: per-block pyarrow ``group_by``
    partials (the combiner — only |groups|-sized partials shuffle), then
    one ``groupby().aggregate`` over the partials."""
    from ray.data.aggregate import Sum

    keys = list(keys)
    sum_cols = list(sum_cols)

    def _partial(b: pa.Table) -> pa.Table:
        aggs = [(c, "sum") for c in sum_cols] + [([], "count_all")]
        g = b.group_by(keys).aggregate(aggs)
        names = keys + [f"{c}_sum" for c in sum_cols] + ["count_all"]
        g = g.select(names)
        return _strip_schema_metadata(
            g.rename_columns(keys + sum_cols + [count_name]))

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              batch_size=None, zero_copy_batch=True)
    return partials.groupby(keys).aggregate(
        *[Sum(c, alias_name=c) for c in sum_cols],
        Sum(count_name, alias_name=count_name),
    )


# --- bucketed (co-located) joins --------------------------------------------

_BUCKET_META = "_bucket_meta.json"


def _bucket_of(keys: np.ndarray, n_buckets: int) -> np.ndarray:
    """Deterministic bucket id for int64 keys: splitmix64 finisher then
    mod — never Python ``hash`` (PYTHONHASHSEED varies per worker)."""
    from ..functions.hashing import mix64

    z = mix64(keys.astype(np.uint64))
    return (z % np.uint64(n_buckets)).astype(np.int32)


def bucketed_write(ds, path: str, key: str, n_buckets: int):
    """Write ``ds`` as Hive-partitioned parquet bucketed by
    hash(key) % n_buckets, recording the bucketing in a manifest.

    The point: pay the partition-by-key cost ONCE at ingest; every
    later join on the same key reads matching bucket pairs co-located
    and never shuffles (see :func:`bucketed_join`) — the 'pick one
    partitioning key and reuse it' pattern."""
    import json
    import os

    def _tag(b: pa.Table) -> pa.Table:
        k = b.column(key).cast(pa.int64()).to_numpy(zero_copy_only=False)
        return b.append_column("bucket", pa.array(_bucket_of(k, n_buckets)))

    ds.map_batches(_tag, batch_format="pyarrow", batch_size=None) \
        .write_parquet(path, partition_cols=["bucket"])
    with open(os.path.join(path, _BUCKET_META), "w") as f:
        json.dump({"key": key, "n_buckets": n_buckets}, f)


def bucketed_join(left_path: str, right_path: str, on: str,
                  right_on: str | None = None, join_type: str = "inner"):
    """Shuffle-free join of two bucket-compatible stores: for each
    bucket i, the left bucket streams as a Dataset while the right
    bucket (1/n_buckets of the right side) loads once per task via the
    broadcast path — the union of the per-bucket joins is the full join,
    because equal keys always land in equal buckets.  Raises if the two
    stores were bucketed differently (a silent mismatch would drop
    rows)."""
    import json
    import os

    import pyarrow.parquet as pq
    import ray.data

    right_on = right_on or on
    with open(os.path.join(left_path, _BUCKET_META)) as f:
        lm = json.load(f)
    with open(os.path.join(right_path, _BUCKET_META)) as f:
        rm = json.load(f)
    if lm["n_buckets"] != rm["n_buckets"]:
        raise ValueError(
            f"bucket count mismatch: {lm['n_buckets']} vs {rm['n_buckets']}")
    if lm["key"] != on or rm["key"] != right_on:
        raise ValueError(
            f"stores bucketed on {lm['key']}/{rm['key']}, join on "
            f"{on}/{right_on}")
    parts = []
    for i in range(lm["n_buckets"]):
        ldir = os.path.join(left_path, f"bucket={i}")
        rdir = os.path.join(right_path, f"bucket={i}")
        if not os.path.isdir(ldir) or not os.path.isdir(rdir):
            if join_type == "inner":
                continue
            raise ValueError(f"missing bucket {i} for {join_type} join")
        lds = ray.data.read_parquet(ldir)
        rtbl = pq.read_table(rdir)
        parts.append(broadcast_join(lds, rtbl, on=[on],
                                    right_on=[right_on],
                                    join_type=join_type))
    if not parts:
        raise ValueError("no overlapping buckets")
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


# --- bloom-filtered semi/anti (shuffle reduction) ----------------------------

_BLOOM_BITS = 1 << 24  # 2 MiB packed; FP ~0.5% at 1M keys, k=3
_BLOOM_SALTS = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9)


def _bloom_positions(keys: np.ndarray, n_bits: int) -> list:
    from ..functions.hashing import mix64

    out = []
    z0 = keys.astype(np.uint64)
    for salt in _BLOOM_SALTS:
        z = mix64(z0 ^ np.uint64(salt))
        out.append((z % np.uint64(n_bits)).astype(np.int64))
    return out


def build_bloom(right_ds, key: str, n_bits: int = _BLOOM_BITS) -> np.ndarray:
    """Mergeable bloom filter of a key column: each block emits a
    partial, the driver ORs them — the same combiner shape as the HLL
    sketch (driver state is one fixed-size bitmap, never O(keys)).

    HYBRID partials: a block whose set-bit positions are smaller than
    the packed bitmap ships the sorted distinct positions instead
    (sparse key streams — the common dim-side case — move KBs per
    block, not n_bits/8; at 10^5 blocks that is the difference between
    GBs and MBs through the object store).  Dense blocks still ship
    the bitmap, so a partial is never larger than n_bits/8 + O(1)."""
    import ray

    def _partial(b: pa.Table) -> pa.Table:
        k = b.column(key).cast(pa.int64()).to_numpy(zero_copy_only=False)
        pos_parts = _bloom_positions(k, n_bits)
        if 8 * 3 * len(k) < n_bits // 8:
            pos = (np.unique(np.concatenate(pos_parts)) if len(k)
                   else np.empty(0, dtype=np.int64))
            return pa.table({"kind": pa.array(["pos"], pa.string()),
                             "blob": pa.array([pos.tobytes()], pa.binary())})
        bits = np.zeros(n_bits // 8, dtype=np.uint8)
        for pos in pos_parts:
            np.bitwise_or.at(bits, pos >> 3,
                             np.left_shift(np.uint8(1), (pos & 7).astype(np.uint8)))
        return pa.table({"kind": pa.array(["bits"], pa.string()),
                         "blob": pa.array([bits.tobytes()], pa.binary())})

    parts = right_ds.map_batches(_partial, batch_format="pyarrow",
                                 batch_size=None).take_all()
    merged = np.zeros(n_bits // 8, dtype=np.uint8)
    for p in parts:
        if p["kind"] == "pos":
            pos = np.frombuffer(p["blob"], dtype=np.int64)
            np.bitwise_or.at(merged, pos >> 3,
                             np.left_shift(np.uint8(1), (pos & 7).astype(np.uint8)))
        else:
            merged |= np.frombuffer(p["blob"], dtype=np.uint8)
    return merged


def _bloom_maybe(bits: np.ndarray, keys: np.ndarray) -> np.ndarray:
    n_bits = len(bits) * 8
    maybe = np.ones(len(keys), dtype=bool)
    for pos in _bloom_positions(keys, n_bits):
        maybe &= ((bits[pos >> 3] >> (pos & 7)) & 1).astype(bool)
    return maybe


def bloom_semi_join(left_ds, right_ds, on: str, right_key: str | None = None,
                    anti: bool = False, n_bits: int = _BLOOM_BITS,
                    num_partitions: int | None = None):
    """Exact semi/anti join with a bloom pre-filter on the LEFT side —
    the shuffle-reduction pattern for the distributed path:

    * semi: rows whose key the bloom rejects are DEFINITELY unmatched —
      dropped before the shuffle; only 'maybe' rows (matches + the FP
      tail) enter the exact ``left_semi`` join.
    * anti: bloom-rejected rows are definitely part of the answer and
      BYPASS the join entirely; only 'maybe' rows go through
      ``left_anti`` to weed out false positives.

    Either way false positives are resolved by the exact join, so the
    result is identical to :func:`semi_join` / :func:`anti_join` — the
    bloom only shrinks the shuffled volume (by ~the non-match fraction).
    The filter itself is a fixed-size mergeable bitmap (`build_bloom`),
    never O(keys) driver state."""
    import ray

    right_key = right_key or on
    bits = build_bloom(right_ds.select_columns([right_key]), right_key,
                       n_bits)
    ref = ray.put(bits)

    def _split(keep_maybe: bool):
        def _f(b: pa.Table) -> pa.Table:
            bb = ray.get(ref)
            k = b.column(on).cast(pa.int64()).to_numpy(zero_copy_only=False)
            m = _bloom_maybe(bb, k)
            return b.filter(pa.array(m if keep_maybe else ~m))
        return _f

    maybes = left_ds.map_batches(_split(True), batch_format="pyarrow",
                                 batch_size=None)
    jt = "left_anti" if anti else "left_semi"
    joined = hash_join(maybes, right_ds.select_columns([right_key]),
                       on=(on,), right_on=(right_key,), join_type=jt,
                       num_partitions=num_partitions)
    if not anti:
        return joined
    definite = left_ds.map_batches(_split(False), batch_format="pyarrow",
                                   batch_size=None)
    return definite.union(joined)


def union_by_name(ds_list):
    """Schema-drift tolerant UNION ALL (``UNION ALL BY NAME``): aligns
    inputs by column NAME — a column missing from one input is
    null-filled at that input's declared type elsewhere, every input is
    cast/reordered to one canonical schema, then plain ``Dataset.union``
    concatenates block lists (no shuffle, no materialization).

    The heterogeneous-shard reality at corpus scale: shards written
    before a column existed union with current data without a rewrite
    pass.  Canonical schema = first-seen name order, first-seen type
    (later inputs cast; an uncastable drift should fail loudly here,
    not silently coerce)."""
    import functools

    import ray.data

    fields: dict[str, pa.DataType] = {}
    for ds in ds_list:
        sch = ds.schema().base_schema
        for name, typ in zip(sch.names, sch.types):
            fields.setdefault(name, typ)

    def _align(sch_names):
        def f(b: pa.Table) -> pa.Table:
            cols = {}
            for name, typ in fields.items():
                if name in sch_names:
                    cols[name] = b.column(name).cast(typ)
                else:
                    cols[name] = pa.nulls(len(b), typ)
            return pa.table(cols)
        return f

    aligned = [
        ds.map_batches(_align(set(ds.schema().base_schema.names)),
                       batch_format="pyarrow", batch_size=None)
        for ds in ds_list
    ]
    return functools.reduce(ray.data.Dataset.union, aligned)


# --- set operations ---------------------------------------------------------

def _distinct_rows(ds, cols):
    """DISTINCT over ``cols`` — hash aggregate, composite-key exchange
    of the projected columns only.  Aggregate partitions that received
    no groups emit 0-row blocks with NO schema, which poison a
    downstream acero join (FieldRef unresolvable); union with a
    schema'd empty seed + repartition concatenates them away."""
    import ray.data
    from ray.data.aggregate import Count

    proj = ds.map_batches(lambda b: b.select(list(cols)),
                          batch_format="pyarrow", batch_size=None)
    agg = (proj.groupby(list(cols)).aggregate(Count(alias_name="_c"))
           .select_columns(list(cols)))
    seed = ray.data.from_arrow(proj.schema().base_schema.empty_table())
    return seed.union(agg).repartition(_default_partitions())


def intersect_distinct(a_ds, b_ds, cols, num_partitions: int | None = None):
    """``SELECT DISTINCT cols FROM a INTERSECT SELECT ... FROM b`` —
    distinct both sides, then a left_semi hash join on the full column
    tuple (set semantics: output rows are unique)."""
    cols = [cols] if isinstance(cols, str) else list(cols)
    return hash_join(_distinct_rows(a_ds, cols), _distinct_rows(b_ds, cols),
                     on=tuple(cols), join_type="left_semi",
                     num_partitions=num_partitions)


def except_distinct(a_ds, b_ds, cols, num_partitions: int | None = None):
    """``... EXCEPT ...`` — distinct A rows with no exact match in B
    (left_anti on the full column tuple)."""
    cols = [cols] if isinstance(cols, str) else list(cols)
    return hash_join(_distinct_rows(a_ds, cols), _distinct_rows(b_ds, cols),
                     on=tuple(cols), join_type="left_anti",
                     num_partitions=num_partitions)


def salted_join(left_ds, right_ds, on: str, n_salts: int = 8,
                num_partitions: int | None = None):
    """Skew-safe distributed hash join: when one left-side key is hot,
    a plain hash join lands that key's every row in ONE partition.
    Salting splits the hot key ``n_salts`` ways — the left side gets a
    per-row salt (position-derived; any spread is correct, the join is
    on (key, salt)), the right side is replicated once per salt value —
    so the hot key's rows stream through ``n_salts`` partitions while
    the exchange grows only by |right| x (n_salts - 1) replicated rows.
    Use when the right side is small relative to the skew it absorbs
    (dim tables); equivalence vs hash_join is exact.
    """
    left_ds = left_ds.map_batches(_sane_blocks, batch_format="pyarrow",
                                  batch_size=None, zero_copy_batch=True)
    right_ds = right_ds.map_batches(_sane_blocks, batch_format="pyarrow",
                                    batch_size=None, zero_copy_batch=True)

    def _salt_left(b: pa.Table) -> pa.Table:
        salt = np.arange(len(b), dtype=np.int64) % n_salts
        return b.append_column("_salt", pa.array(salt, pa.int64()))

    def _replicate_right(b: pa.Table) -> pa.Table:
        idx = np.repeat(np.arange(len(b), dtype=np.int64), n_salts)
        rep = b.take(pa.array(idx))
        salt = np.tile(np.arange(n_salts, dtype=np.int64), len(b))
        return rep.append_column("_salt", pa.array(salt, pa.int64()))

    lt = left_ds.map_batches(_salt_left, batch_format="pyarrow",
                             batch_size=None)
    rt = right_ds.map_batches(_replicate_right, batch_format="pyarrow",
                              batch_size=None)
    joined = hash_join(lt, rt, on=[on, "_salt"],
                       num_partitions=num_partitions)
    return joined.drop_columns(["_salt"])
