"""The jitted distillation train step.

The reference's per-step region (`src/training/train.py:80-122`: teacher
encode + student dense encode + roi_align + loss + DDP all-reduce + AdamW +
logit clamp) collapses into ONE jitted, donated function partitioned over the
`data` mesh axis — gradients are reduced by XLA collectives as a consequence
of the batch sharding, replacing NCCL DDP.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params))


MAX_LOGIT_SCALE = float(np.log(100.0))  # reference clamp (train.py:117-119)


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    loss_fn: Callable,
    mesh: Optional[Mesh] = None,
    donate: bool = True,
    state_sharding=None,
    teacher_sharding=None,
    trainable=None,
    log_grad_norm: Optional[bool] = None,
):
    """Build the jitted train step.

    loss_fn(params, teacher_params, batch, model, rng) -> (loss, metrics).

    `trainable`: optional 'train'/'freeze' label pytree (from
    `optim.trainable_labels`, the same labels the optimizer masks by).
    Frozen leaves are stop-gradiented inside the loss closure, so XLA
    dead-code-eliminates their entire backward computation — the torch
    reference never computes these either (`requires_grad=False` via
    `lock()`, `eva_vit_model.py:500-516`). Without it the step still
    produces correct updates (the optimizer zeroes frozen updates) but
    wastes time on discarded gradients — measurably the patch-embed conv
    weight grad against the full 1024^2 image — and reports a `grad_norm`
    that counts frozen grads torch would never see.

    With a mesh, params/opt state are replicated and the batch is sharded on
    `data`; XLA inserts the gradient all-reduce (psum) automatically.

    FSDP: pass `state_sharding` / `teacher_sharding` (pytrees of NamedSharding
    from `parallel.mesh.fsdp_shardings`, or a single sharding) to keep params
    and optimizer state sharded over an `fsdp` mesh axis — XLA then lowers the
    step to all-gather-weights / reduce-scatter-grads with a fully local
    optimizer update (ZeRO-3).

    `log_grad_norm`: emit a `grad_norm` metric (global norm of the trainable
    gradients). Off by default — the torch reference only ever computes a
    gradient norm when `--grad-clip-norm` is set (`train.py:106-115`), and
    the square-sum reductions cost real step time every step (per-HLO
    profile, PERF.md). None -> CLIPSELF_LOG_GRAD_NORM env (default off).
    """
    if log_grad_norm is None:
        from clipself_tpu.core import knobs

        log_grad_norm = bool(knobs.get("log_grad_norm"))

    def step_fn(state: TrainState, teacher_params, batch, rng):
        rng = jax.random.fold_in(rng, state.step)

        def lf(p):
            if trainable is not None:
                p = jax.tree.map(
                    lambda x, l: x if l == "train" else jax.lax.stop_gradient(x),
                    p, trainable,
                )
            return loss_fn(p, teacher_params, batch, model, rng)

        (loss, metrics), grads = jax.value_and_grad(lf, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # clamp logit_scale to [0, ln(100)] (reference train.py:117-119)
        params = dict(params)
        params["logit_scale"] = jnp.clip(params["logit_scale"], 0.0, MAX_LOGIT_SCALE)
        metrics = dict(metrics)
        metrics["loss"] = loss
        if log_grad_norm:
            metrics["grad_norm"] = optax.global_norm(grads)
        return state.replace(step=state.step + 1, params=params, opt_state=opt_state), metrics

    opts = _tpu_compiler_options()
    if mesh is None:
        return jax.jit(
            step_fn, donate_argnums=(0,) if donate else (), compiler_options=opts
        )

    from clipself_tpu.parallel.mesh import batch_sharding

    repl = NamedSharding(mesh, P())
    # the batch spans every data-like mesh axis (fsdp is still data-parallel;
    # a tensor-parallel 'model' axis replicates the batch)
    data = batch_sharding(mesh)
    st = repl if state_sharding is None else state_sharding
    tch = repl if teacher_sharding is None else teacher_sharding
    return jax.jit(
        step_fn,
        in_shardings=(st, tch, data, repl),
        out_shardings=(st, repl),
        donate_argnums=(0,) if donate else (),
        compiler_options=opts,
    )


def _tpu_compiler_options():
    """Raise the scoped-VMEM budget for the train step on TPU.

    The compiler's default 16MB scoped-vmem cap is far below the v5e's 128MB
    physical VMEM; with the fused flash kernels plus XLA's own VMEM
    prefetch/output-pinning decisions the full train graph can exceed it
    (observed: XLA pinning a 14MB flash-backward output in VMEM for an
    elementwise consumer). 32MB gives the scheduler headroom; override with
    --scoped-vmem-kib 0 (CLIPSELF_SCOPED_VMEM_KIB=0) to keep the compiler
    default."""
    from clipself_tpu.core import knobs

    if jax.default_backend() != "tpu":
        return None
    kib = int(knobs.get("scoped_vmem_kib"))
    if kib <= 0:
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": kib}
