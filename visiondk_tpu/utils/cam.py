"""Class-activation maps on JAX/flax models.

Capability parity with the reference's ``ClassActivationMaper`` (utils/cam.py),
which wraps pytorch-grad-cam's hook-based CAMs (:22-33), picks a target layer
per architecture (:108-155), replays only the spatial transforms on the input
and un-letterboxes the heat-map (:78-106, 157-168).

TPU/JAX-native design: instead of forward/backward *hooks*, the target
activation is captured — and gradient-injected — with
``flax.linen.intercept_methods``:

1. one forward pass records the target module's output (the feature map);
2. the CAM gradient is ``jax.grad`` of the target-class score w.r.t. an
   *injected* feature map: an interceptor replaces the target module's output
   with the differentiated argument, so the chain rule flows from the logit
   back to the activation — hook semantics without mutable state.

Both passes are jitted once per (method, shape) and reused across images.

Supported methods — the reference's full 9-method import list
(utils/cam.py:22-31: gradcam, hirescam, scorecam, gradcampp, ablationcam,
xgradcam, eigencam, eigengradcam, fullgrad) plus layercam:
- gradient methods run one capture + one injected-gradient backward;
- ablationcam/scorecam run chunked O(C) perturbation sweeps;
- fullgrad aggregates |bias × grad| over every conv/BN bias layer, captured
  in a single backward by adding a differentiated zero to each layer output
  (the JAX-native form of its per-layer bias-gradient hooks).
"""

from __future__ import annotations

import re
from functools import partial
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array

CAM_METHODS = (
    "gradcam",
    "gradcampp",
    "xgradcam",
    "layercam",
    "hirescam",
    "eigencam",
    "eigengradcam",
    "ablationcam",   # O(C) forwards: per-channel ablation of the feature map
    "scorecam",      # O(C) forwards: activation-masked inputs
    "fullgrad",      # |bias × grad| over all conv/BN bias layers + input-grad
)
_PERTURB_METHODS = ("ablationcam", "scorecam")
_PERTURB_CHUNK = 64  # channels per jitted batch in the O(C) sweeps

# Per-architecture target-layer regex over flax module paths (the analogue of
# the reference's per-arch ``target_layers`` table, utils/cam.py:108-155).
# The *last* matching path in call order is used.
_TARGET_PATTERNS: Sequence[Tuple[str, str]] = (
    (r"^(resnet|resnext|resnest|seresnet|wide_resnet|legacy_seresnet)", r"stage4_block\d+$"),
    (r"^convnext", r"stage4_block\d+$"),
    (r"^(vit|deit)", r"block\d+/norm1$"),
    (r"^swin", r"stage\d+_block\d+/norm1$"),
    (r"^mobilenet", r"stage\d+_block\d+$"),
    (r"^efficientnet", r"stage\d+_block\d+$"),
)


def _path_str(path: Tuple[str, ...]) -> str:
    return "/".join(path)


def find_target_path(
    model: nn.Module,
    variables: Dict[str, Any],
    example: Array,
    backbone_name: str,
    target_layer: Optional[str] = None,
) -> str:
    """Resolve the CAM target module path. ``target_layer`` (a regex) overrides
    the per-architecture default table."""
    pattern = target_layer
    if pattern is None:
        for arch_re, layer_re in _TARGET_PATTERNS:
            if re.match(arch_re, backbone_name):
                pattern = layer_re
                break
        if pattern is None:
            pattern = r"stage4_block\d+$"  # CNN default

    seen: List[str] = []

    def interceptor(next_fun, args, kwargs, context):
        out = next_fun(*args, **kwargs)
        if context.method_name == "__call__":
            seen.append(_path_str(context.module.path))
        return out

    with nn.intercept_methods(interceptor):
        model.apply(variables, example, train=False)

    matches = [p for p in seen if re.search(pattern, p)]
    if not matches:
        raise ValueError(
            f"no module path matches {pattern!r} for backbone {backbone_name!r};"
            f" available paths: {sorted(set(seen))[:40]}"
        )
    return matches[-1]


def _tree_get(tree: Dict[str, Any], path: Tuple[str, ...]):
    node = tree
    for p in path:
        node = node[p]
    return node


def discover_bias_layers(
    model: nn.Module, variables: Dict[str, Any], example: Array
) -> Dict[str, Tuple[Tuple[int, ...], np.ndarray]]:
    """FullGrad's target set: every conv / BatchNorm with a (effective) bias
    and a spatial output (pytorch-grad-cam's layer_with_2D_bias predicate).
    Returns {module path: (output shape, per-channel bias)} — for BN the
    effective inference bias  β − μ·γ/√(σ²+ε).
    """
    layers: Dict[str, Tuple[Tuple[int, ...], np.ndarray]] = {}

    def interceptor(next_fun, args, kwargs, context):
        out = next_fun(*args, **kwargs)
        m = context.module
        if context.method_name != "__call__" or not hasattr(out, "ndim") or out.ndim != 4:
            return out
        try:
            if isinstance(m, nn.Conv):
                if not m.use_bias:
                    return out
                bias = np.asarray(_tree_get(variables["params"], m.path)["bias"], np.float32)
            elif isinstance(m, nn.BatchNorm):
                p = _tree_get(variables["params"], m.path) if (m.use_scale or m.use_bias) else {}
                bs = _tree_get(variables["batch_stats"], m.path)
                scale = np.asarray(p["scale"], np.float32) if m.use_scale else 1.0
                beta = np.asarray(p["bias"], np.float32) if m.use_bias else 0.0
                mean = np.asarray(bs["mean"], np.float32)
                var = np.asarray(bs["var"], np.float32)
                bias = beta - mean * scale / np.sqrt(var + m.epsilon)
            else:
                return out
        except KeyError:
            return out
        layers[_path_str(m.path)] = (tuple(out.shape), bias)
        return out

    with nn.intercept_methods(interceptor):
        model.apply(variables, example, train=False)
    return layers


def _to_spatial(fmap: np.ndarray, drop_cls: bool) -> np.ndarray:
    """[H,W,C] passthrough; [N,C] token map → [h,w,C] (reference's ViT/Swin
    reshape_transform, utils/cam.py:116-135)."""
    if fmap.ndim == 3:
        return fmap
    n, c = fmap.shape
    side = int(n ** 0.5)
    if side * side == n:
        # already an exact grid: Swin windows-token maps and cls-free ViTs
        # (SigLIP) — dropping a "cls" row here would skew the whole map
        return fmap.reshape(side, side, c)
    if drop_cls:
        fmap = fmap[1:]
        n -= 1
    # floor, not round: ViT pads the token dim up to a sublane multiple
    # (vit.py, 197→200) with pad tokens at the END, so the first ⌊√n⌋² rows
    # are exactly the patch grid; round() would overshoot into the pads
    side = int(n ** 0.5)
    return fmap[: side * side].reshape(side, side, c)


class ClassActivationMaper:
    """CAM generator over a flax classification model.

    ``model.apply({'params', 'batch_stats'}, x, train=False) -> logits``.
    """

    def __init__(
        self,
        model: nn.Module,
        method: str,
        variables: Dict[str, Any],
        example: Array,
        backbone_name: str = "",
        target_layer: Optional[str] = None,
    ):
        if method not in CAM_METHODS:
            raise ValueError(f"method {method!r} not in {CAM_METHODS}")
        self.model = model
        self.method = method
        # One explicit upload; every jitted program below takes the tree as a
        # runtime ARGUMENT. Closure-capturing host param trees embeds them as
        # HLO constants — a ViT-B program then serializes >340 MB and the
        # remote-compile tunnel rejects it (HTTP 413, seen on the first real
        # production CAM run).
        self.variables = jax.device_put(variables)
        variables = self.variables
        # fullgrad aggregates over ALL bias layers; a single target is not used
        # (pytorch-grad-cam likewise ignores target_layers for FullGrad)
        self.target_path = (
            ""
            if method == "fullgrad"
            else find_target_path(model, variables, example, backbone_name, target_layer)
        )
        self._is_token_map = bool(re.search(r"norm1$", self.target_path))

        mdl = self.model
        target = self.target_path

        def capture_fmap(v, x: Array) -> Array:
            box: Dict[str, Array] = {}

            def interceptor(next_fun, args, kwargs, context):
                out = next_fun(*args, **kwargs)
                if (
                    context.method_name == "__call__"
                    and _path_str(context.module.path) == target
                ):
                    box["fmap"] = out
                return out

            with nn.intercept_methods(interceptor):
                mdl.apply(v, x, train=False)
            return box["fmap"]

        def forward_inject(v, fmap: Array, x: Array) -> Array:
            def interceptor(next_fun, args, kwargs, context):
                out = next_fun(*args, **kwargs)
                if (
                    context.method_name == "__call__"
                    and _path_str(context.module.path) == target
                ):
                    return fmap.astype(out.dtype)
                return out

            with nn.intercept_methods(interceptor):
                return mdl.apply(v, x, train=False)

        def score_grad(v, fmap: Array, x: Array, class_idx: Array) -> Tuple[Array, Array]:
            def score(a):
                logits = forward_inject(v, a, x)
                return jnp.take_along_axis(logits, class_idx[:, None], axis=1).sum()

            g = jax.grad(score)(fmap)
            return g

        def scores_inject(v, fmaps: Array, x: Array, class_idx: Array) -> Array:
            """Batched class scores for K injected feature-map variants
            (ablationcam / scorecam's perturbation sweep)."""

            def one(fmap):
                logits = forward_inject(v, fmap[None], x)
                return jnp.take_along_axis(logits, class_idx[:, None], axis=1)[0, 0]

            return jax.lax.map(one, fmaps)

        self._capture = jax.jit(capture_fmap)
        self._grad = jax.jit(score_grad)
        self._logits = jax.jit(lambda v, x: mdl.apply(v, x, train=False))
        self._scores_inject = jax.jit(scores_inject)

        if method == "fullgrad":
            self._bias_layers = discover_bias_layers(mdl, variables, example)
            bias_shapes = {p: s for p, (s, _) in self._bias_layers.items()}

            def fullgrad_grads(v, x: Array, class_idx: Array):
                """d(score)/d(input) and d(score)/d(each bias-layer output),
                all in ONE backward: every target output gets a differentiated
                zero added, so jax.grad w.r.t. the zeros dict is the full set
                of layer-output gradients (hook semantics, one pass)."""

                def score(x_in, eps):
                    def interceptor(next_fun, args, kwargs, context):
                        out = next_fun(*args, **kwargs)
                        p = _path_str(context.module.path)
                        if (
                            context.method_name == "__call__"
                            and p in eps
                            and tuple(out.shape) == tuple(eps[p].shape)
                        ):
                            return out + eps[p].astype(out.dtype)
                        return out

                    with nn.intercept_methods(interceptor):
                        logits = mdl.apply(v, x_in, train=False)
                    return jnp.take_along_axis(logits, class_idx[:, None], axis=1).sum()

                eps0 = {p: jnp.zeros(s, jnp.float32) for p, s in bias_shapes.items()}
                return jax.grad(score, argnums=(0, 1))(x, eps0)

            self._fullgrad = jax.jit(fullgrad_grads)

    # ------------------------------------------------------------ weights

    @staticmethod
    def _cam_from(method: str, fmap: np.ndarray, grad: Optional[np.ndarray]) -> np.ndarray:
        """fmap/grad: [H, W, C] fp32 → cam [H, W]."""
        if method == "eigencam" or (method == "eigengradcam" and grad is None):
            m = fmap
        elif method == "eigengradcam":
            m = fmap * grad
        elif method == "hirescam":
            return np.maximum(fmap * grad, 0).sum(-1)
        elif method == "layercam":
            return np.maximum(fmap * np.maximum(grad, 0), 0).sum(-1)
        elif method == "gradcam":
            w = grad.mean(axis=(0, 1))
            return np.maximum((fmap * w).sum(-1), 0)
        elif method == "gradcampp":
            g2, g3 = grad ** 2, grad ** 3
            denom = 2.0 * g2 + (fmap * g3).sum(axis=(0, 1), keepdims=True)
            alpha = np.divide(g2, denom, out=np.zeros_like(g2), where=denom != 0)
            w = (alpha * np.maximum(grad, 0)).sum(axis=(0, 1))
            return np.maximum((fmap * w).sum(-1), 0)
        elif method == "xgradcam":
            denom = fmap.sum(axis=(0, 1), keepdims=True) + 1e-8
            w = (grad * fmap / denom).sum(axis=(0, 1))
            return np.maximum((fmap * w).sum(-1), 0)
        else:
            raise ValueError(method)
        # eigen variants: first principal component of the (HW, C) matrix
        h, w_, c = m.shape
        flat = m.reshape(-1, c)
        flat = flat - flat.mean(0, keepdims=True)
        _, _, vt = np.linalg.svd(flat, full_matrices=False)
        proj = flat @ vt[0]
        cam = proj.reshape(h, w_)
        if cam.max() < -cam.min():  # sign-correct the component
            cam = -cam
        return np.maximum(cam, 0)

    # ------------------------------------------------------------ public

    # ------------------------------------------------ perturbation methods

    def _channel_weights_ablation(self, fmap, x, class_idx) -> np.ndarray:
        """w_k = (y_c − y_c^{ablate k}) / y_c (AblationCAM)."""
        idx = jnp.asarray([class_idx], jnp.int32)
        c = fmap.shape[-1]
        base = float(np.asarray(self._scores_inject(self.variables, fmap[None, 0], x, idx))[0])
        weights = np.zeros((c,), np.float32)
        chan = jnp.arange(c)
        for s in range(0, c, _PERTURB_CHUNK):
            k = min(_PERTURB_CHUNK, c - s)
            sel = chan[s : s + k]
            if k < _PERTURB_CHUNK:
                sel = jnp.pad(sel, (0, _PERTURB_CHUNK - k))
            keep = (chan[None, :] != sel[:, None]).astype(fmap.dtype)  # [K, C]
            variants = fmap[0][None] * keep.reshape(
                (_PERTURB_CHUNK,) + (1,) * (fmap.ndim - 2) + (c,)
            )
            scores = np.asarray(self._scores_inject(self.variables, variants, x, idx))
            weights[s : s + k] = (base - scores[:k]) / (abs(base) + 1e-8)
        return weights

    def _channel_weights_score(self, fmap_s: np.ndarray, x, class_idx) -> np.ndarray:
        """softmax over channels of the class score on activation-masked
        inputs (ScoreCAM)."""
        idx = class_idx
        h, w, c = fmap_s.shape
        hi, wi = x.shape[1], x.shape[2]
        acts = jnp.asarray(fmap_s)
        acts = jax.image.resize(acts, (hi, wi, c), method="bilinear")
        mn = jnp.min(acts, axis=(0, 1), keepdims=True)
        mx = jnp.max(acts, axis=(0, 1), keepdims=True)
        acts = (acts - mn) / jnp.maximum(mx - mn, 1e-8)  # [Hi, Wi, C] in [0,1]
        scores = np.zeros((c,), np.float32)
        for s in range(0, c, _PERTURB_CHUNK):
            k = min(_PERTURB_CHUNK, c - s)
            masks = jnp.moveaxis(
                jax.lax.dynamic_slice_in_dim(acts, s, k, axis=2), 2, 0
            )  # [k, Hi, Wi]
            if k < _PERTURB_CHUNK:
                masks = jnp.pad(masks, ((0, _PERTURB_CHUNK - k), (0, 0), (0, 0)))
            masked = x[0][None] * masks[..., None]
            logits = np.asarray(self._logits(self.variables, masked))
            scores[s : s + k] = logits[:k, idx]
        e = np.exp(scores - scores.max())
        return (e / e.sum()).astype(np.float32)

    # ------------------------------------------------------------ public

    def __call__(
        self,
        image,
        input_tensor: np.ndarray,
        class_idx: Optional[int] = None,
    ) -> np.ndarray:
        """CAM overlay for one image.

        ``image``: HWC uint8 display image (post-spatial-transform);
        ``input_tensor``: [1, H, W, 3] normalized f32 model input.
        Returns HWC uint8 overlay (reference's show_cam_on_image semantics).
        """
        x = jnp.asarray(input_tensor)
        if class_idx is None:
            class_idx = int(np.argmax(np.asarray(self._logits(self.variables, x))[0]))

        if self.method == "fullgrad":
            gx, geps = self._fullgrad(self.variables, x, jnp.asarray([class_idx], jnp.int32))
            h_in, w_in = x.shape[1], x.shape[2]

            def term(m: np.ndarray) -> np.ndarray:
                """[H,W,C] saliency → per-channel min-max scale → resize to
                input → sum channels (pytorch-grad-cam's scale+aggregate)."""
                m = np.abs(m)
                mn = m.min(axis=(0, 1), keepdims=True)
                mx = m.max(axis=(0, 1), keepdims=True)
                m = (m - mn) / np.maximum(mx - mn, 1e-8)
                r = np.asarray(
                    jax.image.resize(jnp.asarray(m), (h_in, w_in, m.shape[-1]), "bilinear")
                )
                return r.sum(-1)

            cam = term(np.asarray(gx, np.float32)[0] * np.asarray(x, np.float32)[0])
            for p, (_, bias) in self._bias_layers.items():
                g = np.asarray(geps[p], np.float32)[0]  # [H, W, C]
                cam = cam + term(g * bias)
            return self._finish(image, cam)

        fmap = self._capture(self.variables, x)

        if self.method in _PERTURB_METHODS:
            fmap_np = np.asarray(fmap, np.float32)[0]
            fmap_s = _to_spatial(fmap_np, drop_cls=self._is_token_map)
            if self.method == "ablationcam":
                w = self._channel_weights_ablation(fmap, x, class_idx)
            else:
                w = self._channel_weights_score(fmap_s, x, class_idx)
            cam = np.maximum((fmap_s * w).sum(-1), 0)
            return self._finish(image, cam)

        if self.method in ("eigencam",):
            grad = None
        else:
            grad = self._grad(self.variables, fmap, x, jnp.asarray([class_idx], jnp.int32))
            grad = np.asarray(grad, np.float32)[0]
        fmap = np.asarray(fmap, np.float32)[0]

        fmap_s = _to_spatial(fmap, drop_cls=self._is_token_map)
        grad_s = _to_spatial(grad, drop_cls=self._is_token_map) if grad is not None else None
        cam = self._cam_from(self.method, fmap_s, grad_s)
        return self._finish(image, cam)

    @staticmethod
    def _finish(image, cam: np.ndarray) -> np.ndarray:
        cam = cam - cam.min()
        if cam.max() > 0:
            cam = cam / cam.max()
        image = np.asarray(image)
        h, w = image.shape[:2]
        cam_img = np.asarray(
            jax.image.resize(jnp.asarray(cam), (h, w), method="bilinear")
        )
        return overlay_cam(image, cam_img)


def overlay_cam(image: np.ndarray, cam: np.ndarray, alpha: float = 0.5) -> np.ndarray:
    """Blend a [0,1] heat-map onto an RGB uint8 image with a jet colormap."""
    heat = _jet(np.clip(cam, 0.0, 1.0))
    out = (1 - alpha) * image.astype(np.float32) + alpha * heat
    return np.clip(out, 0, 255).astype(np.uint8)


def _jet(x: np.ndarray) -> np.ndarray:
    """Minimal jet colormap → RGB float [0,255] (no matplotlib dependency)."""
    r = np.clip(1.5 - np.abs(4.0 * x - 3.0), 0, 1)
    g = np.clip(1.5 - np.abs(4.0 * x - 2.0), 0, 1)
    b = np.clip(1.5 - np.abs(4.0 * x - 1.0), 0, 1)
    return np.stack([r, g, b], axis=-1) * 255.0
