"""Knowledge distillation — a *working* version of what the reference stubs.

The reference ships a ``Distiller`` (CE + temperature-KL on teacher/student
logits, distills/distillers.py:7-32) and a ``DistillCenterProcessor`` whose
teacher init is commented out (:34-38); its Trainer raises NotImplementedError
on every distill path (engine/procedure/train.py:190,194). Here both are
implemented:

- ``make_distill_step`` — one jitted program: teacher forward (stop-grad,
  eval mode) + student fwd/bwd with
  ``loss = cls_weight·CE(s, y) + kl_weight·KL_T(s‖t)``.
- ``make_embed_distill_step`` — embedding distillation against precomputed
  teacher features (EmbeddingDistillDataset pairs, basedataset.py:598-657):
  MSE or cosine loss on L2-normalized embeddings.
- ``DistillCenterProcessor`` — CenterProcessor over ``cfgs['student']`` with
  a frozen teacher restored from ``cfgs['teacher']``.

The teacher stays replicated and is evaluated in the same compiled step so
XLA overlaps both model passes; under DP the teacher forward shards on the
batch like the student.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from visiondk_tpu.engine.state import TrainState, create_train_state
from visiondk_tpu.engine.steps import StepConfig, device_preprocess
from visiondk_tpu.engine.trainer import CenterProcessor
from visiondk_tpu.losses import create_lossfn
from visiondk_tpu.losses.losses import distill_kl
from visiondk_tpu.models.ema import update_ema
from visiondk_tpu.models.factory import get_model

Array = jax.Array


def make_distill_step(
    student_model,
    teacher_model,
    teacher_variables: Dict[str, Any],
    tx: optax.GradientTransformation,
    lossfn: Callable,
    cfg: StepConfig,
    base_rng: Array,
    cls_weight: float = 0.5,
    kl_weight: float = 0.5,
    temperature: float = 4.0,
    device_augment: Optional[Callable] = None,
) -> Callable:
    """step(state, batch, lam) -> (state, metrics) — signature-compatible with
    make_train_step so the trainer loop can swap it in. ``device_augment``
    runs before preprocessing, so teacher and student see the SAME augmented
    batch (matching host-side augmentation semantics)."""

    def step_fn(state: TrainState, batch: Dict[str, Array], lam: Array):
        rng = jax.random.fold_in(base_rng, state.step)
        raw = batch["image"]
        if device_augment is not None:
            # independent stream; the dropout stream stays as pre-round-4
            raw = device_augment(jax.random.fold_in(rng, 2), raw)
        images = device_preprocess(raw, cfg.mean, cfg.std)
        labels = batch["label"]
        rngs = {"dropout": rng}

        t_logits = jax.lax.stop_gradient(
            teacher_model.apply(teacher_variables, images, train=False)
        )

        def loss_fn(params):
            out = student_model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images, train=True, rngs=rngs, mutable=["batch_stats"],
            )
            s_logits, new_state = out
            new_bs = new_state.get("batch_stats", {})
            loss_cls = lossfn(s_logits, labels, None)
            loss_kl = distill_kl(s_logits, t_logits, temperature)
            return cls_weight * loss_cls + kl_weight * loss_kl, (new_bs, loss_cls, loss_kl)

        (loss, (new_bs, loss_cls, loss_kl)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_updates = state.ema_updates + 1
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            ema_params=update_ema(
                state.ema_params, new_params, new_updates, cfg.ema_decay, cfg.ema_tau
            ),
            ema_batch_stats=update_ema(
                state.ema_batch_stats, new_bs, new_updates, cfg.ema_decay, cfg.ema_tau
            ),
            ema_updates=new_updates,
        )
        return new_state, {"loss": loss, "loss_cls": loss_cls, "loss_kl": loss_kl}

    return jax.jit(step_fn, donate_argnums=(0,))


def make_embed_distill_step(
    student_model,
    tx: optax.GradientTransformation,
    cfg: StepConfig,
    base_rng: Array,
    loss_type: str = "cosine",
) -> Callable:
    """Embedding distillation: batch = {'image', 'feature' [B, D] teacher
    embeddings}. Student embedding chases the teacher's (both L2-normalized
    for 'cosine'; raw for 'mse')."""

    def step_fn(state: TrainState, batch: Dict[str, Array], lam: Array):
        images = device_preprocess(batch["image"], cfg.mean, cfg.std)
        target = batch["feature"].astype(jnp.float32)
        rng = jax.random.fold_in(base_rng, state.step)

        def loss_fn(params):
            out = student_model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images, train=True, rngs={"dropout": rng},
                mutable=["batch_stats"], method=student_model.embed,
            )
            emb, new_state = out
            emb = emb.astype(jnp.float32)
            if loss_type == "cosine":
                e = emb / jnp.maximum(jnp.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
                t = target / jnp.maximum(jnp.linalg.norm(target, axis=1, keepdims=True), 1e-12)
                loss = jnp.mean(1.0 - jnp.sum(e * t, axis=1))
            else:
                loss = jnp.mean(jnp.square(emb - target))
            return loss, new_state.get("batch_stats", {})

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_updates = state.ema_updates + 1
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            ema_params=update_ema(
                state.ema_params, new_params, new_updates, cfg.ema_decay, cfg.ema_tau
            ),
            ema_batch_stats=update_ema(
                state.ema_batch_stats, new_bs, new_updates, cfg.ema_decay, cfg.ema_tau
            ),
            ema_updates=new_updates,
        )
        return new_state, {"loss": loss}

    return jax.jit(step_fn, donate_argnums=(0,))


class DistillCenterProcessor(CenterProcessor):
    """Classification training with a frozen logit teacher.

    Config layout (completing the reference's stub, distillers.py:34-38):

        student: <full standard config>
        teacher:
          model: {task: classification, name: ..., num_classes: ...}
          weight: run/teacher/best       # checkpoint dir
          ema: true
        distill: {cls_weight: 0.5, kl_weight: 0.5, temperature: 4.0}
    """

    def __init__(self, cfgs: Dict[str, Any], project: str, **kwargs):
        super().__init__(cfgs["student"], project=project, **kwargs)
        tcfg = cfgs["teacher"]
        dcfg = cfgs.get("distill", {})
        self.cls_weight = float(dcfg.get("cls_weight", 0.5))
        self.kl_weight = float(dcfg.get("kl_weight", 0.5))
        self.temperature = float(dcfg.get("temperature", 4.0))

        self.teacher_model = get_model(tcfg["model"], dtype=self.compute_dtype)
        dummy = jnp.zeros((1, self.imgsz, self.imgsz, 3), jnp.float32)
        variables = self.teacher_model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(0)}, dummy, train=False
        )
        if tcfg.get("weight"):
            from visiondk_tpu.engine.checkpoint import CheckpointManager
            from visiondk_tpu.models.ema import init_ema

            weight = Path(tcfg["weight"])
            use_ema = tcfg.get("ema", True)
            params = variables["params"]
            bstats = variables.get("batch_stats", {})
            template = (
                {"ema_params": init_ema(params), "ema_batch_stats": init_ema(bstats)}
                if use_ema
                else {"params": params, "batch_stats": bstats}
            )
            restored = CheckpointManager(weight.parent).restore_partial(weight.name, template)
            key = "ema_params" if use_ema else "params"
            bs_key = "ema_batch_stats" if use_ema else "batch_stats"
            self.teacher_variables = {
                "params": restored[key],
                "batch_stats": restored[bs_key],
            }
        else:
            self.teacher_variables = {
                "params": variables["params"],
                "batch_stats": variables.get("batch_stats", {}),
            }

    def _get_train_step(self, tx, key, lossfn, mixup: bool, device_aug: bool = False):
        key = ("distill", key)
        if key not in self._step_cache:
            cfg = StepConfig(
                task="classification",
                mean=self.data_processor.normalization[0],
                std=self.data_processor.normalization[1],
            )
            self._step_cache[key] = make_distill_step(
                self.model,
                self.teacher_model,
                self.teacher_variables,
                tx,
                lossfn,
                cfg,
                jax.random.key(self.seed + 1),
                cls_weight=self.cls_weight,
                kl_weight=self.kl_weight,
                temperature=self.temperature,
                device_augment=self.device_augment_fn if device_aug else None,
            )
        return self._step_cache[key]
