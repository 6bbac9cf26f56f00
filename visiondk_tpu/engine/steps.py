"""Jitted train / eval steps.

The reference's per-batch hot loop (engine/procedure/train.py:106-147 and
:202-215: autocast forward → loss → scale/backward → clip(10) → step → EMA)
becomes ONE compiled XLA program per variant:

    uint8 batch → device normalize (fused) → [mixup] → fwd+bwd (bf16 MXU)
    → clip → optimizer → EMA tree update

Gradient averaging across the mesh's ``data`` axis is inserted by jit from
the batch sharding (replacing DDP's NCCL all-reduce); BN statistics reduce
over the global batch (SyncBN semantics, reference main.py:57-60).

Strategy knobs and their TPU-native forms:
- mixup     — static variant flag; per-batch Beta lambda is a traced scalar
              (reference train.py:108-111, 24-35).
- OHEM      — extra no-grad forward → per-sample mask → masked loss; the
              shape-static equivalent of dropping rows
              (reference structure/sampler.py:11-31, train.py:114-117).
- SAM       — two grad passes inside one step with BN stats frozen in the
              second (reference engine/optimizer.py:44-67, train.py:149-175).
- EMA       — ramped-decay tree update on device (reference models/ema.py).

Static variants (mixup on/off × sam on/off × ohem on/off) each compile once
and are cached for the whole run.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from visiondk_tpu.engine.optim import SAMConfig, sam_perturb
from visiondk_tpu.engine.state import TrainState
from visiondk_tpu.models.ema import update_ema

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class OHEMConfig:
    min_kept: int = 8
    thresh: float = 0.7
    ignore_index: int = 255


@dataclasses.dataclass(frozen=True)
class StepConfig:
    """Static configuration of a train-step variant."""

    task: str = "classification"        # "classification" | "embedding"
    mixup: bool = False
    sam: Optional[SAMConfig] = None
    ohem: Optional[OHEMConfig] = None
    ema_decay: float = 0.9999
    ema_tau: float = 2000.0
    mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    std: Tuple[float, float, float] = (0.229, 0.224, 0.225)


def device_preprocess(images: Array, mean, std) -> Array:
    """uint8 NHWC → normalized f32. Runs on device, fused into the step
    (host workers only decode/resize/augment-geometry; per the north star the
    arithmetic-heavy normalize rides the TPU's VPU)."""
    if images.dtype == jnp.uint8:
        images = images.astype(jnp.float32) / 255.0
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (images - mean) / std


def ohem_mask(logits: Array, labels: Array, cfg: OHEMConfig) -> Array:
    """Keep samples whose true-class prob < max(k-th smallest, thresh)
    (reference structure/sampler.py:11-31), as a f32 weight vector."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=1)
    b = labels.shape[0]
    tp = jnp.take_along_axis(probs, labels[:, None].astype(jnp.int32), axis=1)[:, 0]
    valid_ignore = labels != cfg.ignore_index
    sorted_tp = jnp.sort(jnp.where(valid_ignore, tp, jnp.inf))
    kth = sorted_tp[jnp.minimum(cfg.min_kept, b - 1)]
    threshold = jnp.maximum(kth, cfg.thresh)
    return (valid_ignore & (tp < threshold)).astype(jnp.float32)


def _sam_local_grads(
    model_loss: Callable,
    mesh,
    sam_cfg: SAMConfig,
    params,
    batch_stats,
    images: Array,
    labels: Array,
    labels_b: Array,
    lam: Array,
    sw: Optional[Array],
    dropout_key: Array,
):
    """SAM two-pass with PER-DEVICE perturbation (m-sharpness parity with the
    reference's no-sync first backward, train.py:157-159, optimizer.py:44-67):

        shard_map over 'data':
          g1    = local grad (no psum)        ← reference first backward
          w+ε   = sam_perturb(params, g1)     ← per-device ε
          g2    = local grad at w+ε, pmean'd  ← reference second backward (DDP)

    BN running-stat updates are taken from the clean pass and pmean'd across
    shards (per-shard moments averaged — matching the framework's SyncBN
    stance at the first-moment level; the reference's default DDP BN is fully
    per-rank). Returns (loss, new_batch_stats, grads) — all replicated.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from visiondk_tpu.parallel.mesh import with_current_mesh

    has_sw = sw is not None

    def body(params, batch_stats, images, labels, labels_b, lam, sw_arg, key):
        # per-shard dropout stream (DDP ranks have independent seeds)
        key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        rngs = {"dropout": key}
        sw_l = sw_arg if has_sw else None

        def local_loss(p, mutable):
            # inside the manual region the batch is already per-shard: the
            # fused pallas kernels must run unwrapped (their own shard_map
            # would nest over an in-scope axis)
            with with_current_mesh(None):
                return model_loss(
                    p, batch_stats, images, labels, labels_b, lam, sw_l, rngs, mutable
                )

        (loss, new_bs), g1 = jax.value_and_grad(local_loss, has_aux=True)(params, True)
        perturbed = sam_perturb(params, g1, sam_cfg)
        (_, _), g2 = jax.value_and_grad(local_loss, has_aux=True)(perturbed, True)
        pm = lambda t: jax.tree_util.tree_map(
            lambda x: jax.lax.pmean(x, "data"), t
        )
        return pm(loss), pm(new_bs), pm(g2)

    sw_arg = sw if has_sw else jnp.zeros((images.shape[0],), jnp.float32)
    data_spec = P("data")
    rep = P()
    return shard_map(
        body,
        mesh=mesh,
        in_specs=(rep, rep, data_spec, data_spec, data_spec, rep, data_spec, rep),
        out_specs=(rep, rep, rep),
        check_vma=False,
    )(params, batch_stats, images, labels, labels_b, lam, sw_arg, dropout_key)


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    lossfn: Callable,
    cfg: StepConfig,
    base_rng: Array,
    donate: bool = True,
    device_augment: Optional[Callable] = None,
) -> Callable:
    """Build step(state, batch, lam) -> (state, metrics).

    ``batch`` = {'image': uint8/f32 [B,H,W,3], 'label': int [B] or f32 [B,C]}.
    ``lam``   = mixup lambda (traced; only used when cfg.mixup).
    ``device_augment`` = optional jitted uint8 batch augmentation stage
    (ops/device_augment.make_device_augment), keyed by fold_in(rng, step) and
    fused ahead of normalize — the host keeps decode + geometry only.
    """

    def apply_model(params, batch_stats, images, labels, rngs, mutable):
        variables = {"params": params, "batch_stats": batch_stats}
        if cfg.task == "embedding":
            out = model.apply(
                variables, images, labels, train=True, rngs=rngs,
                mutable=["batch_stats"] if mutable else False,
            )
        else:
            out = model.apply(
                variables, images, train=True, rngs=rngs,
                mutable=["batch_stats"] if mutable else False,
            )
        if mutable:
            y, new_state = out
            return y, new_state.get("batch_stats", {})
        return out, batch_stats

    def compute_loss(params, batch_stats, images, labels, labels_b, lam, sw, rngs, mutable):
        """``images`` arrive pre-mixed (mixing happens in step_fn so this body
        is shard-local-safe: no cross-shard jnp.take inside the SAM-local
        shard_map); ``labels_b`` is the permuted label set when cfg.mixup."""
        if cfg.task == "embedding":
            (logits, aux), new_bs = apply_model(params, batch_stats, images, labels, rngs, mutable)
            loss = lossfn(logits, labels, sw) + aux
        elif cfg.mixup:
            logits, new_bs = apply_model(params, batch_stats, images, labels, rngs, mutable)
            loss = lam * lossfn(logits, labels, sw) + (1.0 - lam) * lossfn(
                logits, labels_b, sw
            )
        else:
            logits, new_bs = apply_model(params, batch_stats, images, labels, rngs, mutable)
            loss = lossfn(logits, labels, sw)
        return loss, new_bs

    # SAM m-sharpness (reference train.py:157-159: first backward under
    # model.no_sync()): per-shard first grad → per-shard ε → globally averaged
    # second grad. Decided at build time from the published mesh; pure-DP only
    # (a 'model'-sharded margin head can't sit inside a data-only manual
    # region).
    sam_local_mesh = None
    if cfg.sam is not None and cfg.sam.local_perturb:
        from visiondk_tpu.parallel.mesh import current_mesh

        _mesh = current_mesh()
        if (
            _mesh is not None
            and dict(_mesh.shape).get("data", 1) > 1
            and dict(_mesh.shape).get("model", 1) == 1
        ):
            sam_local_mesh = _mesh

    def step_fn(state: TrainState, batch: Dict[str, Array], lam: Array):
        # Trace order matters for the remote XLA scheduler: keep the
        # augment-free path bit-identical to the pre-round-4 trace
        # (preprocess first, then rng) — reordering these measured −7%
        # train throughput on the v5e tunnel backend.
        if device_augment is None:
            images = device_preprocess(batch["image"], cfg.mean, cfg.std)
            rng = jax.random.fold_in(base_rng, state.step)
            rng_perm, rng_drop = jax.random.split(rng)
        else:
            rng = jax.random.fold_in(base_rng, state.step)
            # 2-way split preserved for stream stability (tests pin the perm
            # stream); the augment key is an independent fold_in off the rng
            rng_perm, rng_drop = jax.random.split(rng)
            raw = device_augment(jax.random.fold_in(rng, 2), batch["image"])
            images = device_preprocess(raw, cfg.mean, cfg.std)
        labels = batch["label"]

        rngs = {"dropout": rng_drop}
        perm = jax.random.permutation(rng_perm, images.shape[0]) if cfg.mixup else None

        sw = None
        if cfg.ohem is not None:
            # OHEM mask from the CLEAN images (reference filters pre-forward,
            # train.py:114-117)
            pre_logits, _ = apply_model(
                state.params, state.batch_stats, images, labels, rngs, mutable=False
            )
            sw = ohem_mask(jax.lax.stop_gradient(pre_logits), labels, cfg.ohem)

        if cfg.mixup:
            images_in = lam * images + (1.0 - lam) * jnp.take(images, perm, axis=0)
            labels_b = jnp.take(labels, perm, axis=0)
        else:
            images_in, labels_b = images, labels

        grad_fn = jax.value_and_grad(
            lambda p, mutable: compute_loss(
                p, state.batch_stats, images_in, labels, labels_b, lam, sw, rngs, mutable
            ),
            has_aux=True,
        )

        if sam_local_mesh is not None:
            loss, new_bs, grads = _sam_local_grads(
                model_loss=compute_loss,
                mesh=sam_local_mesh,
                sam_cfg=cfg.sam,
                params=state.params,
                batch_stats=state.batch_stats,
                images=images_in,
                labels=labels,
                labels_b=labels_b,
                lam=lam,
                sw=sw,
                dropout_key=rng_drop,
            )
        else:
            (loss, new_bs), grads = grad_fn(state.params, True)
            if cfg.sam is not None:
                # Climb to w+e(w), recompute grads; the second pass's BN stat
                # updates are discarded — running stats stay frozen at the
                # clean pass's values (reference update_sam, train.py:161-173).
                perturbed = sam_perturb(state.params, grads, cfg.sam)
                (_, _), grads = grad_fn(perturbed, True)

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        # Gradient accumulation (optax.MultiSteps): params change on only 1 of
        # every k mini-steps. EMA must tick on APPLIED updates only, or its
        # effective horizon shrinks k× and the warmup ramp runs k× too fast
        # versus the equivalent full-batch run. MultiStepsState.mini_step
        # wraps to 0 exactly when the buffered update was applied.
        mini_step = getattr(new_opt, "mini_step", None)
        if mini_step is not None:
            applied = (mini_step == 0)
            new_updates = state.ema_updates + applied.astype(jnp.int32)
            gate = lambda new, old: jax.tree_util.tree_map(
                lambda n, o: jnp.where(applied, n, o), new, old
            )
        else:
            new_updates = state.ema_updates + 1
            gate = lambda new, old: new
        new_ema_p = gate(
            update_ema(state.ema_params, new_params, new_updates, cfg.ema_decay, cfg.ema_tau),
            state.ema_params,
        )
        new_ema_bs = gate(
            update_ema(state.ema_batch_stats, new_bs, new_updates, cfg.ema_decay, cfg.ema_tau),
            state.ema_batch_stats,
        )

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            ema_params=new_ema_p,
            ema_batch_stats=new_ema_bs,
            ema_updates=new_updates,
        )
        metrics = {"loss": loss}
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def _inference_apply(model, quant, quant_cache=None):
    """model.apply, optionally routed through the int8 Dense interceptor
    (ops/quant.py) — inference-only surfaces (eval/embed), never training.
    ``quant_cache`` (ops.quant.build_weight_cache over the SAME param tree the
    step consumes) skips the per-batch in-graph weight quantization; serving
    CLIs pass it, training-time eval must not (weights move every epoch)."""
    from visiondk_tpu.ops.quant import check_quant, quantized_apply

    quant = check_quant(quant)  # reject typos ('int4', 'fp8') loudly
    if quant is None:
        return model.apply

    return partial(quantized_apply, model, weight_cache=quant_cache)


def make_eval_step(
    model, cfg: StepConfig, use_ema: bool = True, quant: Optional[str] = None,
    quant_cache=None,
) -> Callable:
    """Classification eval: (state, batch) -> (logits f32 [B,C]). Metrics are
    reduced on host (mirrors procedure/evaluation.py's loop)."""
    apply = _inference_apply(model, quant, quant_cache)

    def eval_fn(state: TrainState, batch: Dict[str, Array]) -> Array:
        images = device_preprocess(batch["image"], cfg.mean, cfg.std)
        params = state.ema_params if use_ema else state.params
        bs = state.ema_batch_stats if use_ema else state.batch_stats
        logits = apply(
            {"params": params, "batch_stats": bs}, images, train=False
        )
        return logits.astype(jnp.float32)

    return jax.jit(eval_fn)


def make_embed_step(
    model, cfg: StepConfig, use_ema: bool = True, quant: Optional[str] = None,
    quant_cache=None,
) -> Callable:
    """Embedding extraction: (state, batch) -> L2-normalized [B, feat_dim]
    (FeatureExtractor semantics, models/faceX/face_model.py:93-143)."""
    apply = _inference_apply(model, quant, quant_cache)

    def embed_fn(state: TrainState, batch: Dict[str, Array]) -> Array:
        images = device_preprocess(batch["image"], cfg.mean, cfg.std)
        params = state.ema_params if use_ema else state.params
        bs = state.ema_batch_stats if use_ema else state.batch_stats
        feats = apply(
            {"params": params, "batch_stats": bs},
            images,
            train=False,
            method=model.embed,
        )
        feats = feats.astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(jnp.square(feats), axis=1, keepdims=True))
        return feats / jnp.maximum(norm, 1e-12)

    return jax.jit(embed_fn)
