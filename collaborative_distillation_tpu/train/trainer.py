"""Distillation trainer: optax Adam + jit'd train step with data parallelism.

The TPU replacement for the reference's epoch/step loop (main.py:94-134):
same optimization (Adam lr 1e-4, main.py:84; weighted loss sum main.py:99-107)
but the step is one compiled XLA program with donated params/opt-state, and
the batch may be sharded over a ``data`` mesh axis — gradients are averaged
by XLA-inserted psums (the reference is strictly single-GPU, SURVEY.md §2.3).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.specs import decoder_spec, encoder_spec
from .losses import kd2sd_losses, sd_reconstruct_losses, se_distill_losses

__all__ = ["TrainConfig", "make_loss_fn", "Trainer"]


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (defaults == main.py:26-55 argparse defaults)."""
    mode: str = "wct_se"          # wct_se | wct_sd | wct_sd_kd2sd
    stage: int = 5
    lr: float = 1e-4
    # cosine-decay lr to lr_final over lr_decay_steps (0 = constant lr, the
    # reference's choice, main.py:84). The schedule rides optax's step count
    # inside opt_state, so it survives checkpoint/resume.
    lr_final: float = 0.0
    lr_decay_steps: int = 0
    batch_size: int = 16
    epochs: int = 20
    lw_feat: float = 10.0
    lw_pixl: float = 1.0
    lw_perc: float = 1.0
    lw_kd: float = 1.0
    aux_relu: bool = False        # --updim_relu
    speedup: int = 16
    # mixed precision: forward/backward in this dtype, master weights +
    # Adam state stay f32 (loss MSEs accumulate in f32 regardless —
    # losses.mse upcasts). "bfloat16" halves the HBM traffic of the conv
    # stacks on TPU; the reference is f32-only.
    compute_dtype: str = "float32"


def make_loss_fn(cfg: TrainConfig) -> tuple[Callable, dict[str, float]]:
    """(loss_graph(params, frozen, batch) -> (loss_dict, rec), loss_weights)."""
    k = cfg.stage
    be_spec = encoder_spec("original", k)
    bd_spec = decoder_spec("original", k)
    se_spec = encoder_spec("16x", k, aux=True)
    if cfg.mode == "wct_se":
        weights = {"feat": cfg.lw_feat, "pixl": cfg.lw_pixl, "perc": cfg.lw_perc}
        fn = partial(se_distill_losses, se_spec=se_spec, be_spec=be_spec,
                     bd_spec=bd_spec, aux_relu=cfg.aux_relu,
                     terms=tuple(n for n, w in weights.items() if w))
    elif cfg.mode == "wct_sd":
        sd_spec = decoder_spec("16x", k)
        weights = {"pixl": cfg.lw_pixl, "perc": cfg.lw_perc}
        fn = partial(sd_reconstruct_losses, sd_spec=sd_spec, se_spec=se_spec,
                     be_spec=be_spec,
                     terms=tuple(n for n, w in weights.items() if w))
    elif cfg.mode == "wct_sd_kd2sd":
        sd_spec = decoder_spec("16x", k, aux=True)
        fn = partial(kd2sd_losses, sd_spec=sd_spec, se_spec=se_spec,
                     be_spec=be_spec, bd_spec=bd_spec, aux_relu=cfg.aux_relu)
        weights = {"pixl": cfg.lw_pixl, "perc": cfg.lw_perc, "kd": cfg.lw_kd}
    else:
        raise ValueError(f"unknown training mode {cfg.mode!r}")
    return fn, weights


class Trainer:
    """Holds student params + Adam state; runs jit'd (optionally DP) steps.

    ``mesh`` with a ``data`` axis shards the batch; params/opt-state stay
    replicated and XLA inserts the gradient all-reduce over ICI.
    """

    def __init__(self, cfg: TrainConfig, student_params, frozen_params,
                 *, mesh: Mesh | None = None):
        from ..utils.jaxconfig import enable_persistent_cache
        enable_persistent_cache()  # replay step compiles across processes
        self.cfg = cfg
        self.loss_graph, self.loss_weights = make_loss_fn(cfg)
        if cfg.lr_decay_steps:
            lr = optax.cosine_decay_schedule(
                cfg.lr, cfg.lr_decay_steps, alpha=cfg.lr_final / cfg.lr)
        else:
            lr = cfg.lr
        self.tx = optax.adam(lr)
        self.params = student_params
        self.opt_state = self.tx.init(student_params)
        self.frozen = frozen_params
        self.mesh = mesh
        self.step_count = 0

        cdt = jnp.dtype(cfg.compute_dtype)
        if cdt == jnp.float32:
            cast = lambda tree: tree
        else:
            def cast(tree):
                return jax.tree.map(
                    lambda x: x.astype(cdt)
                    if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)

        def step(params, opt_state, frozen, batch):
            if batch.dtype == jnp.uint8:
                # uint8 transport: the host ships raw bytes (4x less PCIe /
                # relay-link traffic than f32) and the [0,1] normalization
                # fuses into the first conv on device
                batch = batch.astype(jnp.float32) / 255.0

            def total_loss(p):
                # p is cast INSIDE the differentiated function: jax.grad
                # through astype gives f32 master-weight gradients from the
                # low-precision forward/backward (standard mixed precision)
                losses, rec = self.loss_graph(cast(p), cast(frozen), cast(batch))
                total = sum(self.loss_weights[name] * val for name, val in losses.items())
                return total, (losses, rec.astype(jnp.float32))

            (_, (losses, rec)), grads = jax.value_and_grad(total_loss, has_aux=True)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, losses, rec

        if mesh is not None:
            repl = NamedSharding(mesh, P())
            data = NamedSharding(mesh, P("data"))
            self._step = jax.jit(
                step,
                in_shardings=(repl, repl, repl, data),
                out_shardings=(repl, repl, repl, data),
                donate_argnums=(0, 1),
            )
            self._batch_sharding = data
        else:
            self._step = jax.jit(step, donate_argnums=(0, 1))
            self._batch_sharding = None

    def train_step(self, batch) -> tuple[dict[str, float], Any]:
        """One optimization step; returns (loss scalars, reconstruction)."""
        batch = jnp.asarray(batch)
        if self._batch_sharding is not None:
            batch = jax.device_put(batch, self._batch_sharding)
        self.params, self.opt_state, losses, rec = self._step(
            self.params, self.opt_state, self.frozen, batch)
        self.step_count += 1
        return losses, rec

    # --- checkpointing (save/restore with real resume, unlike the
    #     reference's save-only --resume flag, SURVEY.md §5) ---

    def save(self, path: str, *, epoch: int = 0, step: int = 0) -> None:
        from ..utils.checkpoint import save_checkpoint
        save_checkpoint(path, {
            "params": self.params,
            "opt_state": self.opt_state,
            "meta": {"epoch": epoch, "step": step, "mode": self.cfg.mode,
                     "stage": self.cfg.stage},
        })

    def restore(self, path: str) -> dict:
        from ..utils.checkpoint import load_checkpoint
        tree = load_checkpoint(path, {
            "params": self.params,
            "opt_state": self.opt_state,
            "meta": {"epoch": 0, "step": 0, "mode": self.cfg.mode,
                     "stage": self.cfg.stage},
        })
        self.params = tree["params"]
        self.opt_state = tree["opt_state"]
        return tree["meta"]
