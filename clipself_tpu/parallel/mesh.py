"""Device mesh and sharding helpers.

TPU-native replacement for the reference's process-group machinery
(`src/training/distributed.py`, `dist_utils.py`): one `jax.sharding.Mesh`
with a `data` axis (extensible with `fsdp` for optimizer-state sharding).
Gradient all-reduce (DDP's role) falls out of pjit's partitioning of the
batch axis; host-side object gathers become `multihost_utils`.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: Optional[str] = None, num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host bootstrap (reference `init_distributed_device`,
    `src/training/distributed.py:63-114`, collapsed to JAX's single runtime
    call). No-op when env auto-detection suffices or on single-host."""
    import logging

    import jax

    log = logging.getLogger("clipself_tpu")
    multi_proc_env = any(
        os.environ.get(k)
        for k in ("COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS")
    )
    # reference-style launcher discovery (`distributed.py:24-60`): SLURM /
    # OpenMPI world sizes; CLIPSELF_DISTRIBUTED=1 opts in on plain TPU pods
    # where only instance metadata (no env) identifies the slice
    world = int(
        os.environ.get("SLURM_NTASKS")
        or os.environ.get("OMPI_COMM_WORLD_SIZE")
        or 0
    )
    opt_in = os.environ.get("CLIPSELF_DISTRIBUTED") == "1"
    if (
        coordinator is None and num_processes is None
        and not (multi_proc_env or world > 1 or opt_in)
    ):
        return  # single-process: nothing to bootstrap (auto-detect can hang)
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
        log.info(
            "jax.distributed initialized: process %d of %d",
            jax.process_index(), jax.process_count(),
        )
    except (RuntimeError, ValueError) as e:
        # LOUD: a silently-failed bootstrap would train one independent
        # model per host with no cross-host gradient sync
        log.warning(
            "jax.distributed.initialize failed (%s); continuing "
            "single-process — if this is a multi-host launch the hosts "
            "will NOT be synchronized", e,
        )


def create_mesh(
    n_devices: Optional[int] = None,
    axis_names: tuple[str, ...] = ("data",),
    shape: Optional[tuple[int, ...]] = None,
) -> Mesh:
    """Create a mesh over local (or all) devices.

    Defaults to a 1-D data-parallel mesh — the reference's only parallelism
    (SURVEY.md §2.7) — but accepts arbitrary shapes for hybrid layouts, e.g.
    ``axis_names=('data', 'fsdp'), shape=(2, 4)``.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    if n_devices is None and int(np.prod(shape)) == len(jax.devices()):
        # ICI-aware ordering: lay the mesh out along physical torus axes so
        # collectives ride ICI links (scaling-book recipe)
        try:
            from jax.experimental import mesh_utils

            dev_array = mesh_utils.create_device_mesh(shape)
            return Mesh(dev_array, axis_names)
        except Exception:
            pass
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


_DATA_LIKE_AXES = ("data", "fsdp")  # batch-sharded; 'model' replicates the batch


def batch_sharding(mesh: Mesh, axis=None) -> NamedSharding:
    """Shard the leading (batch) dim. By default the batch spans every
    data-like mesh axis — on a ('data', 'fsdp') mesh the fsdp axis is still
    data-parallel (ZeRO shards state, not the batch semantics) — while a
    tensor-parallel 'model' axis sees the batch replicated."""
    if axis is None:
        axis = tuple(a for a in mesh.axis_names if a in _DATA_LIKE_AXES)
    return NamedSharding(mesh, P(axis))


def shard_batch(mesh: Mesh, batch, axis=None):
    """Device-put a host batch pytree with the batch dim sharded."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def num_batch_shards(mesh: Mesh, axis=None) -> int:
    """How many ways `batch_sharding` splits the leading dim."""
    if axis is None:
        axis = tuple(a for a in mesh.axis_names if a in _DATA_LIKE_AXES)
    axes = (axis,) if isinstance(axis, str) else tuple(axis)
    n = 1
    for a in axes:
        n *= mesh.shape[a]
    return n


def put_batch_array(mesh: Mesh, x, axis=None):
    """Device-put one array batch-sharded, replicating instead when the
    leading dim does not divide (uneven eval tail batches)."""
    import jax.numpy as jnp

    x = jnp.asarray(x)
    if x.ndim and x.shape[0] % num_batch_shards(mesh, axis) == 0:
        return jax.device_put(x, batch_sharding(mesh, axis))
    return jax.device_put(x, NamedSharding(mesh, P()))


def _fsdp_spec(shape, axis_size: int, axis: str, min_size: int, taken=()) -> P:
    """Shard the largest dim divisible by `axis_size`; replicate small or
    indivisible leaves (the standard JAX FSDP layout rule). `taken` marks dim
    indices already claimed by another axis (hybrid TP+FSDP layouts)."""
    if len(shape) == 0 or int(np.prod(shape)) < min_size:
        return P()
    best, best_d = -1, 0
    for i, d in enumerate(shape):
        if i not in taken and d % axis_size == 0 and d > best_d:
            best, best_d = i, d
    if best < 0:
        return P()
    spec: list = [None] * len(shape)
    spec[best] = axis
    return P(*spec)


def fsdp_shardings(mesh: Mesh, tree, axis: str = "fsdp", min_size: int = 2**15):
    """ZeRO-3-style sharding pytree for params / optimizer state.

    Each large leaf is sharded over `axis` along its largest divisible
    dimension; everything else replicates. Applying the same rule to params
    and optimizer state gives mu/nu the same layout as their param (same
    shapes -> same spec), so the optimizer update is fully local and XLA
    turns the gradient all-reduce into reduce-scatter + all-gather.

    Returns a pytree of NamedSharding matching `tree` (works on concrete
    arrays or ShapeDtypeStructs).
    """
    if axis not in mesh.shape or mesh.shape[axis] == 1:
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), tree)
    n = mesh.shape[axis]
    return jax.tree.map(
        lambda x: NamedSharding(mesh, _fsdp_spec(getattr(x, "shape", ()), n, axis, min_size)),
        tree,
    )


def shard_tree(mesh: Mesh, tree, axis: str = "fsdp", min_size: int = 2**15):
    """Device-put a pytree with `fsdp_shardings` placement."""
    sh = fsdp_shardings(mesh, tree, axis=axis, min_size=min_size)
    return jax.tree.map(jax.device_put, tree, sh)


# ---- tensor parallelism ---------------------------------------------------

_TP_RULES = (
    # Megatron layout for transformer blocks: column-parallel into the block,
    # row-parallel out of it; XLA's SPMD propagation turns the row-parallel
    # contraction's partial sums into the single per-block all-reduce.
    # EVA blocks (attn./mlp. submodules):
    (r"attn.*(q_proj|k_proj|v_proj|qkv).*kernel", (None, "T")),
    (r"attn.*(q_proj|k_proj|v_proj).*bias", ("T",)),
    (r"attn.*(q_bias|v_bias)", ("T",)),
    (r"attn.*inner_attn_ln.*(scale|bias)", ("T",)),
    (r"attn.*proj.*kernel", ("T", None)),
    (r"mlp.*(w1|w2|fc1|c_fc).*kernel", (None, "T")),
    (r"mlp.*(w1|w2|fc1|c_fc).*bias", ("T",)),
    (r"mlp.*ffn_ln.*(scale|bias)", ("T",)),
    (r"mlp.*(w3|fc2|c_proj).*kernel", ("T", None)),
    # OpenCLIP-family resblocks store these flat on the block (the packed
    # in_proj [D, 3D] shards its output dim; XLA reshards across the q/k/v
    # split boundaries as needed):
    (r"in_proj.*kernel", (None, "T")),
    (r"in_proj.*bias", ("T",)),
    (r"out_proj.*kernel", ("T", None)),
    (r"c_fc.*kernel", (None, "T")),
    (r"c_fc.*bias", ("T",)),
    (r"c_proj.*kernel", ("T", None)),
)


def _tp_spec(key_str: str, shape, axis: str, axis_size: int) -> P:
    import re

    if "blocks_" not in key_str and "resblocks_" not in key_str:
        return P()
    for pat, proto in _TP_RULES:
        if re.search(pat, key_str):
            if len(proto) != len(shape):
                return P()
            spec = tuple(axis if p == "T" else None for p in proto)
            # every sharded dim must divide evenly; else replicate the leaf
            for s, d in zip(spec, shape):
                if s is not None and d % axis_size != 0:
                    return P()
            return P(*spec)
    return P()


def tp_shardings(mesh: Mesh, tree, axis: str = "model"):
    """Megatron-style tensor-parallel shardings for transformer-block params
    (and their optimizer-state mirrors — matching is by path suffix, so the
    same call works on a TrainState).

    The reference has no tensor parallelism (SURVEY.md §2.7: DP only); this is
    the TPU-native `model` axis for towers too large to replicate. Attention
    q/k/v and MLP up-projections are column-parallel, attention out-proj and
    MLP down-projection row-parallel; head count and MLP hidden width must
    divide the axis size for a leaf to shard, otherwise it replicates.
    """
    if axis not in mesh.shape or mesh.shape[axis] == 1:
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), tree)
    n = mesh.shape[axis]
    from jax.tree_util import keystr, tree_map_with_path

    out = tree_map_with_path(
        lambda path, x: NamedSharding(
            mesh, _tp_spec(keystr(path), getattr(x, "shape", ()), axis, n)
        ),
        tree,
    )
    if all(s.spec == P() for s in jax.tree.leaves(out)):
        import logging

        logging.getLogger("clipself_tpu").warning(
            "tp_shardings: no parameter matched the tensor-parallel rules — "
            "the '%s' axis will replicate everything (check block naming and "
            "divisibility by %d)", axis, n,
        )
    return out


def hybrid_shardings(
    mesh: Mesh,
    tree,
    tp_axis: str = "model",
    fsdp_axis: str = "fsdp",
    min_size: int = 2**15,
):
    """Compose TP and FSDP: a leaf takes its Megatron TP spec when one
    applies, with FSDP sharding layered onto its remaining (replicated) dims;
    pure-FSDP otherwise. Either axis may be absent/size-1."""
    tp = tp_shardings(mesh, tree, axis=tp_axis)
    fs = fsdp_shardings(mesh, tree, axis=fsdp_axis, min_size=min_size)
    has_fsdp = fsdp_axis in mesh.shape and mesh.shape[fsdp_axis] > 1

    def merge(tps: NamedSharding, fss: NamedSharding, x):
        if all(p is None for p in tps.spec) or tps.spec == P():
            return fss
        if not has_fsdp:
            return tps
        # layer fsdp onto the dims TP left unsharded (same rule as pure FSDP)
        n = mesh.shape[fsdp_axis]
        shape = getattr(x, "shape", ())
        spec = list(tps.spec) + [None] * (len(shape) - len(tps.spec))
        taken = tuple(i for i, s in enumerate(spec) if s is not None)
        fspec = list(_fsdp_spec(shape, n, fsdp_axis, min_size, taken=taken))
        fspec += [None] * (len(shape) - len(fspec))
        merged = [t if t is not None else f for t, f in zip(spec, fspec)]
        return NamedSharding(mesh, P(*merged))

    return jax.tree.map(merge, tp, fs, tree)
