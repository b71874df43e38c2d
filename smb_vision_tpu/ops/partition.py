"""GSPMD partitioning for Pallas-backed ops.

`pallas_call` lowers to a TPU custom call with NO SPMD partitioning
rule: under `jit` with sharded operands, XLA ALL-GATHERS the inputs and
runs the kernel replicated on every device (measured on the 8-device
CPU mesh: a batch-sharded input to a trivial kernel compiled to 4
all-gathers and a replicated output). On a real multi-chip mesh that
silently turns data-parallel/fsdp training into every-chip-computes-
the-full-batch — only the explicitly shard_map'ed paths (sequence
parallel, ring attention, pipeline) were safe.

`dim0_partitioned` wraps a pallas-backed function whose every operand
and result shares a partitionable leading dim (rows for the MLP kernel,
batch*heads for the flash kernels): under GSPMD the same kernel runs on
each shard with the leading-dim sharding preserved; all other dims are
declared need-replication (Shardy rule built generically from ranks).
Inside shard_map the wrapper is transparent (verified: a
custom_partitioning op traces per-shard under manual axes), so the SP /
ring / pipeline paths are unaffected.

The wrapped callable must be cheap to re-trace (it is called per shard
shape); pair it with an `lru_cache` factory keyed on the static kernel
parameters, as ops/mlp.py and ops/attention.py do.
"""

from __future__ import annotations

import itertools

import jax
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P


def _dim0(arg_shape):
    spec = getattr(arg_shape.sharding, "spec", None)
    return spec[0] if spec is not None and len(spec) else None


def _dim0_sharding(mesh, row):
    def one(s):
        return NamedSharding(mesh, P(row, *([None] * (len(s.shape) - 1))))
    return one


def _make_dim0_rule(sharded_args):
    def rule(mesh, value_types, result_types):
        """Einsum-like Shardy rule: shared leading factor `b` on the
        sharded operands and every result; every other dim its own
        need-replication factor."""
        counter = itertools.count()

        def term(t, lead_b):
            dims = ["b"] if lead_b else [f"f{next(counter)}"]
            dims += [f"f{next(counter)}" for _ in range(len(t.shape) - 1)]
            return " ".join(dims)

        ins = [term(t, i in sharded_args)
               for i, t in enumerate(value_types)]
        outs = [term(t, True) for t in result_types]
        n = next(counter)
        return (", ".join(ins) + " -> " + ", ".join(outs),
                {"need_replication_factors":
                 tuple(f"f{i}" for i in range(n))})
    return rule


def dim0_partitioned(fun, sharded_args=(0,)):
    """Wrap `fun` (positional array args -> array or tuple of arrays)
    with an SPMD rule that partitions the leading dim of the operands in
    `sharded_args` (and of every result, which inherits operand 0's
    dim-0 sharding), replicating all other operands and dims."""
    f = custom_partitioning(fun)
    sharded = frozenset(sharded_args)

    def infer_sharding_from_operands(mesh, arg_shapes, shape):
        one = _dim0_sharding(mesh, _dim0(arg_shapes[0]))
        return jax.tree.map(one, shape)

    def partition(mesh, arg_shapes, result_shape):
        one = _dim0_sharding(mesh, _dim0(arg_shapes[0]))
        repl = _dim0_sharding(mesh, None)
        return (mesh, fun, jax.tree.map(one, result_shape),
                tuple((one if i in sharded else repl)(a)
                      for i, a in enumerate(arg_shapes)))

    f.def_partition(partition,
                    infer_sharding_from_operands=infer_sharding_from_operands,
                    sharding_rule=_make_dim0_rule(sharded))
    return f
