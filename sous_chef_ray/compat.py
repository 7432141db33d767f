"""Runtime workarounds for known Ray Data issues (applied on import).

ray 2.49 hash-shuffle schema loss (joins + aggregates over sparse inputs)
-------------------------------------------------------------------------
``HashShufflingOperatorBase._do_add_input_inner`` broadcasts an input
side's schema to the aggregator pool together with the FIRST block it
shuffles (``send_empty_blocks=True`` exactly once per input sequence,
hash_shuffle.py:548,589).  ``_shuffle_block`` however short-circuits on
an empty block (``block.num_rows == 0`` → return, hash_shuffle.py:223)
WITHOUT sending the schema-bearing empty shards — so when the first
block happens to be empty the broadcast is consumed and never happens,
and when an input side is empty ALTOGETHER (a filter matched nothing)
it can never happen.  Every aggregator partition that side sends no
rows to then finalizes against a schemaless ``pa.table({})``:

* ``Dataset.join`` raises ``ArrowInvalid: No match or multiple matches
  for key field reference ...`` (acero can't find the key column) —
  observed on a compiled LEFT JOIN between two derived DISTINCT
  subqueries at sf0.01, where the sort-based groupby upstream emits
  zero-column empty blocks for its sparse output partitions and one of
  them is shuffled first.

Two cooperating patches:

1. driver side (``_do_add_input_inner``): filter zero-row blocks out of
   each bundle so the one-shot broadcast flag is spent on a block that
   actually carries data; if a bundle is ENTIRELY empty, pass it through
   but re-arm the flag afterwards (a later non-empty block broadcasts
   again — duplicate empty shards are harmless, aggregators just append
   them).
2. shuffle task (``_shuffle_block``): when asked to broadcast schemas
   and handed an empty block that still has columns, apply the block
   transformer (for aggregates it installs the partial-agg schema) and
   fan the schema-bearing empty shards out to every partition instead
   of short-circuiting.  Non-empty blocks delegate to the original
   implementation unchanged.

Both patches are version-guarded (no-ops unless ray 2.49.x) and fall
back to stock behavior on any unexpected layout.

Known limit: a join side that is empty in its ENTIRETY (a filter that
matched nothing) still reaches the join as schemaless zero-column
blocks — Ray carries no schema for an all-empty stream through the
sort-based shuffle, so there is nothing to broadcast and the join still
fails.  SQL queries avoid the shape by construction (the compiled plans
take the broadcast DimIndex path for bounded sides); fixing it in
general needs schema propagation upstream in Ray itself.
"""

from __future__ import annotations


def _patch_hash_shuffle_schema_broadcast() -> None:
    try:
        import ray
        if not ray.__version__.startswith("2.49"):
            return
        from ray.data._internal.execution.interfaces.ref_bundle import (
            RefBundle,
        )
        from ray.data._internal.execution.operators import hash_shuffle as hs
        orig_add = hs.HashShufflingOperatorBase._do_add_input_inner
        orig_shuffle_fn = hs._shuffle_block._function
    except Exception:  # pragma: no cover - layout changed; skip
        return
    if getattr(orig_add, "_sous_chef_patched", False):
        return

    # --- patch 2: schema-broadcasting shuffle task -----------------------
    @ray.remote
    def _shuffle_block_compat(
        block,
        input_index,
        key_columns,
        pool,
        block_transformer=None,
        send_empty_blocks=False,
        override_partition_id=None,
    ):
        import pyarrow as pa

        import ray as _ray
        from ray.data._internal.execution.operators import (
            hash_shuffle as _hs,
        )
        from ray.data.block import BlockAccessor, BlockExecStats

        if (
            send_empty_blocks
            and isinstance(block, pa.Table)
            and block.num_rows == 0
            and block.num_columns > 0
        ):
            stats = BlockExecStats.builder()
            shard = block
            if block_transformer is not None:
                try:
                    shard = block_transformer(block)
                except Exception:
                    shard = block  # best effort: pre-transform schema
            if isinstance(shard, pa.Table) and shard.num_columns > 0:
                shard = _hs._create_empty_table(shard.schema)
                waits = [
                    pool.get_aggregator_for_partition(pid).submit.remote(
                        input_index, pid, _ray.put(shard)
                    )
                    for pid in range(pool.num_partitions)
                ]
                while waits:
                    _, waits = _ray.wait(
                        waits, num_returns=len(waits), timeout=1
                    )
            meta = BlockAccessor.for_block(block).get_metadata(
                exec_stats=stats.build()
            )
            return (meta, {})
        return orig_shuffle_fn(
            block,
            input_index,
            key_columns,
            pool,
            block_transformer=block_transformer,
            send_empty_blocks=send_empty_blocks,
            override_partition_id=override_partition_id,
        )

    # --- patch 1: driver-side bundle filtering + flag re-arm -------------
    def _do_add_input_inner(self, input_bundle, input_index):
        all_empty = False
        try:
            kept = [
                (ref, meta)
                for ref, meta in input_bundle.blocks
                if meta.num_rows is None or meta.num_rows > 0
            ]
            if len(kept) != len(input_bundle.blocks):
                if kept:
                    input_bundle = RefBundle(
                        blocks=tuple(kept),
                        schema=input_bundle.schema,
                        owns_blocks=input_bundle.owns_blocks,
                    )
                else:
                    all_empty = True
        except Exception:  # pragma: no cover - fall through unfiltered
            pass
        out = orig_add(self, input_bundle, input_index)
        if all_empty:
            # the empty blocks best-effort-broadcast the schema (patch 2)
            # but must not consume the one-shot flag: a later non-empty
            # block still gets to broadcast the authoritative schema
            try:
                self._has_schemas_broadcasted[input_index] = False
            except Exception:  # pragma: no cover
                pass
        return out

    _do_add_input_inner._sous_chef_patched = True
    hs.HashShufflingOperatorBase._do_add_input_inner = _do_add_input_inner
    hs._shuffle_block = _shuffle_block_compat


_patch_hash_shuffle_schema_broadcast()
