"""CenterProcessor: the host-side orchestration loop.

Capability parity with the reference engine (engine/vision_engine.py:67-561):
owns model/data/loss/optimizer/schedule/EMA/logger, runs ``run_classifier``
(per-epoch train + EMA val + last/best checkpoints) and ``run_embedding``
(batch-wise schedule, save_freq face/CBIR eval, Epoch_N checkpoints) — with
the god-object state replaced by a functional ``TrainState`` threaded through
jitted steps, and every epoch-level *strategy* (warmup augs, momentum swap,
mixup window, focal swap, aug weakening, progressive resize —
vision_engine.py:344-375) expressed as host-side schedule control that picks
the step variant / feeds scalars.

Distribution: one ``MeshContext`` replaces DDP/DistributedSampler/SyncBN
(§2.9); batch sharding + jit insert the gradient psum over ICI.
"""

from __future__ import annotations

import math
import time
from functools import partial
from pathlib import Path
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from visiondk_tpu.config.checks import normalize_accumulate
from visiondk_tpu.config.loader import get_imgsz, yaml_dump
from visiondk_tpu.data.dataprocessor import SmartDataProcessor
from visiondk_tpu.data.loader import DevicePrefetcher
from visiondk_tpu.engine import evaluation as cls_eval
from visiondk_tpu.engine import face_eval, cbir_eval
from visiondk_tpu.engine.checkpoint import CheckpointManager
from visiondk_tpu.engine.optim import SAMConfig, create_optimizer
from visiondk_tpu.engine.schedules import create_scheduler, momentum_schedule
from visiondk_tpu.engine.state import TrainState, create_train_state, place_state
from visiondk_tpu.engine.steps import (
    OHEMConfig,
    StepConfig,
    make_embed_step,
    make_eval_step,
    make_train_step,
)
from visiondk_tpu.losses import create_lossfn
from visiondk_tpu.models.factory import get_model
from visiondk_tpu.parallel.mesh import MeshContext, build_mesh, set_current_mesh
from visiondk_tpu.utils.logger import SmartLogger
from visiondk_tpu.utils.meters import AverageMeter
from visiondk_tpu.utils.metrics_writer import MetricsWriter
from visiondk_tpu.utils.plots import colorstr


class CenterProcessor:
    def __init__(
        self,
        cfgs: Dict[str, Any],
        project: str,
        train: bool = True,
        mesh: Optional[MeshContext] = None,
        compute_dtype=jnp.bfloat16,
        seed: int = 0,
    ):
        self.cfgs = cfgs
        self.model_cfg = cfgs["model"]
        self.data_cfg = cfgs["data"]
        self.hyp_cfg = cfgs["hyp"]
        self.task = self.model_cfg["task"]
        self.project = Path(project)
        self.mesh = mesh or build_mesh()
        # publish for kernel-owning layers: pallas calls inside a sharded jit
        # need the mesh for their shard_map wrap (models/layers.py Attention)
        set_current_mesh(self.mesh.mesh)
        self.compute_dtype = compute_dtype
        self.seed = seed
        self.training = train

        primary = self.mesh.is_primary()
        self.project.mkdir(parents=True, exist_ok=True)
        logfile = (
            str(self.project / f"log{time.strftime('%Y%m%d-%H%M%S')}.log")
            if primary and train
            else None
        )
        self.logger = SmartLogger(filename=logfile)

        if train:
            yaml_dump(cfgs, self.project / "config.yaml")

        # model (functional; params created lazily in run_*). Margin heads pad
        # the class dim to a 128-lane multiple: real class counts
        # (face.yaml:34 → 58,671, odd) don't divide mesh axes; pad columns are
        # logit-masked (heads.MarginHead). Padding is UNCONDITIONAL for the
        # embedding tasks (not gated on n_model>1) so the checkpointed weight
        # shape is the same on a single chip and on any power-of-two mesh —
        # train-on-pod/resume-on-chip round-trips. (A non-power-of-two model
        # axis changes the lcm and therefore the shape; cross-mesh resume is
        # supported between meshes whose model axes divide 128.)
        pad_mult = 1
        if self.task in ("face", "cbir"):
            pad_mult = int(np.lcm(128, self.mesh.n_model))
        self.model = get_model(
            self.model_cfg, dtype=compute_dtype, class_pad_multiple=pad_mult
        )

        # data
        self.data_processor = SmartDataProcessor(
            self.data_cfg, project=str(self.project),
            rank_is_primary=primary, training=train, task=self.task,
        )
        # device-side augmentation stage (ops/device_augment): the lifted
        # per-pixel randomized ops run jitted on the batch inside the train
        # step; active only in epochs where train augments are live
        self.device_augment_fn = None
        # group_size: branch draws per group of N samples (1 = exact
        # per-sample reference semantics, None = legacy vmapped form; see
        # ops/device_augment.make_device_augment)
        self.device_augment_group_size = self.data_cfg["train"].get(
            "device_augment_group_size", 8
        )
        # H2D lookahead (data/loader.py DevicePrefetcher): device_put of batch
        # N+1 overlaps step N; bounds device-side staging to `depth` batches
        self.device_prefetch_depth = int(
            self.data_cfg["train"].get("device_prefetch", 2)
        )
        if train and self.data_processor.device_augment_cfg:
            from visiondk_tpu.ops.device_augment import (
                describe_split,
                make_device_augment,
            )

            self.device_augment_fn = make_device_augment(
                self.data_processor.device_augment_cfg,
                group_size=self.device_augment_group_size,
            )
            if primary:
                self.logger.both(
                    "device augment split — "
                    + describe_split(
                        self.data_processor.train_pipeline_cfg,
                        self.data_processor.device_augment_cfg,
                    )
                )
        # final resize in the val pipeline wins (reference semantics); when the
        # pipeline has no spatial op (pre-sized data), model.image_size governs
        self.imgsz = (
            get_imgsz(self.data_cfg["val"]["augment"])
            or self.model_cfg.get("image_size")
        )
        if self.imgsz is None:
            raise ValueError(
                "cannot infer input size: no resize op in data.val.augment and "
                "model.image_size is unset"
            )

        # loss (vision_engine.py:107-132)
        loss_cfg = self.hyp_cfg["loss"]
        self.loss_choice = "ce" if loss_cfg.get("ce") else "bce"
        label_smooth = self.hyp_cfg.get("label_smooth", 0.0)
        if self.loss_choice == "ce":
            # embedding heads pad the class dim (see pad_mult above): smoothing
            # must distribute mass over the REAL classes only, or every −1e9
            # pad column adds ~ls/C·1e9 to the loss
            valid = None
            if self.task in ("face", "cbir"):
                head_cfg = next(iter(self.model_cfg["head"].values()))
                valid = int(head_cfg["num_class"])
            self.lossfn = create_lossfn(
                "ce", label_smooth=label_smooth, valid_class=valid
            )
            self.thresh = 0
        else:
            self.lossfn = create_lossfn("bce")
            self.thresh = loss_cfg["bce"][1]
            if train and self.task == "classification":
                self.data_processor.set_label_smoothing(
                    self.model_cfg["num_classes"], label_smooth
                )

        strategy = self.hyp_cfg.get("strategy", {})
        # OHEM (CE only)
        ohem = strategy.get("ohem", [False])
        self.ohem_cfg = (
            OHEMConfig(*[x for x in ohem[1:4]]) if ohem and ohem[0] and self.loss_choice == "ce" else None
        )
        # mixup window
        mix = strategy.get("mixup", [0.0, 0])
        if isinstance(mix, dict):
            mix = [mix["ratio"], mix["duration"]]
        self.mixup_ratio, self.mixup_duration = float(mix[0]), int(mix[1])
        # focal swap
        focal = strategy.get("focal", [False])
        self.focal_fn = (
            create_lossfn("focal", alpha=focal[1], gamma=focal[2])
            if focal and focal[0] and self.loss_choice == "bce"
            else None
        )
        # progressive learning (vision_engine.py:141-156)
        self.prog_learn = bool(strategy.get("prog_learn", False))
        warm_ep = self.hyp_cfg["warm_ep"]
        epochs = self.hyp_cfg["epochs"]
        if self.prog_learn:
            remaining = epochs - warm_ep
            s1, s2 = remaining // 4, remaining // 4
            self.resize_chnodes = [warm_ep, warm_ep + s1, warm_ep + s1 + s2]
            mi = self.imgsz
            self.imgsz_milestone = [int(x) for x in np.linspace(int(mi * 0.5), mi, 3)]
        # SAM (hyp.sam_local_perturb: false reverts to global-ε m-sharpness,
        # docs/PARITY.md "Known intentional differences" #1)
        opt_name = self.hyp_cfg["optimizer"][0]
        self.sam_cfg = (
            SAMConfig(local_perturb=bool(self.hyp_cfg.get("sam_local_perturb", True)))
            if opt_name == "sam"
            else None
        )
        self.opt_name = opt_name
        self.layer_wise = bool(self.hyp_cfg["optimizer"][1]) if isinstance(
            self.hyp_cfg["optimizer"], (list, tuple)
        ) and len(self.hyp_cfg["optimizer"]) > 1 else False

        # writer=train: only the training run owns destructive crash recovery
        # in its run dir; a train=False construction (validate/predict paths)
        # must not delete a live trainer's in-flight Orbax tmp dirs
        self.ckpt = CheckpointManager(self.project, writer=bool(train))
        self._step_cache: Dict[Any, Callable] = {}
        self.metrics_writer = (
            MetricsWriter(self.project) if (train and primary) else None
        )
        self._lr_fn: Optional[Callable] = None

    # ------------------------------------------------------------ helpers

    def _init_state(self, tx, batch_example) -> TrainState:
        rng = jax.random.key(self.seed)
        dummy = jnp.zeros(batch_example, jnp.float32)
        if self.task == "classification":
            variables = self.model.init({"params": rng, "dropout": rng}, dummy, train=False)
        else:
            dummy_labels = jnp.zeros((batch_example[0],), jnp.int32)
            variables = self.model.init(
                {"params": rng, "dropout": rng}, dummy, dummy_labels, train=False
            )
        state = create_train_state(variables, tx)
        return place_state(self.mesh, state)

    def _build_tx(self, steps_per_epoch: int, discrete_per_epoch: bool):
        hyp = self.hyp_cfg
        # gradient accumulation (hyp.accumulate: k, beyond reference): optax
        # MultiSteps averages k mini-batch grads before one applied update.
        accum = normalize_accumulate(hyp)
        # The inner optimizer's count advances once per APPLIED update (1 of
        # every `accum` mini-steps, buffers rolling across epoch boundaries),
        # so one schedule-epoch is steps_per_epoch/accum applied counts —
        # kept FRACTIONAL: flooring would run the schedule up to accum/spe
        # fast (and spe < accum would collapse to 1).
        spe_applied = steps_per_epoch / accum
        epoch_sched = create_scheduler(
            hyp["scheduler"], hyp["warm_ep"], hyp["epochs"], hyp["lr0"], hyp.get("lrf_ratio")
        )
        mom_sched_ep = momentum_schedule(
            hyp["warm_ep"], hyp["momentum"], hyp.get("warmup_momentum", hyp["momentum"])
        )

        def to_epochs(count):
            t = count / spe_applied
            return jnp.floor(t) if discrete_per_epoch else t

        lr_sched = lambda count: epoch_sched(to_epochs(count))
        mom_sched = lambda count: mom_sched_ep(to_epochs(count))
        # host-side LR readback for metrics logging: call sites pass
        # MINI-step counts (state.step / loader-step counters); the schedule
        # runs on applied counts.
        self._lr_fn = lambda mini_count: lr_sched(mini_count // accum)
        base = "sgd" if self.opt_name == "sam" else self.opt_name
        tx = create_optimizer(
            base, lr_sched, hyp["weight_decay"], mom_sched,
            layer_wise_lr=self.layer_wise,
            backbone_freeze=bool(self.model_cfg.get("backbone_freeze")),
            bn_freeze_affine=bool(self.model_cfg.get("bn_freeze_affine")),
        )
        if accum > 1:
            import optax

            tx = optax.MultiSteps(tx, every_k_schedule=accum)
        return tx

    def _get_train_step(
        self, tx, key, lossfn, mixup: bool, device_aug: bool = False
    ) -> Callable:
        if key not in self._step_cache:
            cfg = StepConfig(
                task="classification" if self.task == "classification" else "embedding",
                mixup=mixup,
                sam=self.sam_cfg,
                # OHEM coexists with mixup (reference filters the batch before
                # the mixed forward, train.py:114-117): the mask is computed on
                # the clean images and weights both mixed loss terms.
                ohem=self.ohem_cfg,
                mean=self.data_processor.normalization[0],
                std=self.data_processor.normalization[1],
            )
            self._step_cache[key] = make_train_step(
                self.model, tx, lossfn, cfg, jax.random.key(self.seed + 1),
                device_augment=self.device_augment_fn if device_aug else None,
            )
        return self._step_cache[key]

    def _local_bs(self, global_bs: int) -> int:
        """Per-process train loader batch size. ``data.train.bs`` is the
        GLOBAL batch (docs/MIGRATION.md); each process loads its disjoint
        1/process_count slice and the slices are stitched into the global
        batch in ``_shard_batch``."""
        n_proc = jax.process_count()
        if global_bs % max(n_proc, 1):
            raise ValueError(
                f"data.train.bs={global_bs} must be divisible by the process "
                f"count ({n_proc}): each process feeds bs/process_count rows "
                f"of the global batch"
            )
        return global_bs // max(n_proc, 1)

    def _shard_batch(self, batch: Dict[str, np.ndarray]):
        arrays = {k: v for k, v in batch.items() if k != "valid"}
        if jax.process_count() > 1:
            # each process holds only its rows of the global batch: stitch
            # them into one global array over the 'data' axis (device_put
            # would wrongly treat each host's slice as the whole batch)
            return {
                k: jax.make_array_from_process_local_data(self.mesh.batch, v)
                for k, v in arrays.items()
            }
        return jax.device_put(arrays, self.mesh.batch)

    def _epoch_strategy(self, epoch: int, lossfn, aug_epoch: int, log: bool = True):
        """Apply this epoch's strategy mutations (reference
        vision_engine.py:344-375) and return (lossfn, mixup_active).

        Pure function of the epoch number given construction-time config, so a
        resume replays epochs [0, start) with ``log=False`` to reconstruct the
        augment pipeline / focal swap / progressive size — the reference
        forgets all of these on resume (its ``==`` triggers never re-fire,
        vision_engine.py:344-375); replaying fixes that latent bug.
        """
        dp = self.data_processor
        warm_ep = self.hyp_cfg["warm_ep"]
        primary = self.mesh.is_primary() and log
        if epoch == 0:
            dp.set_augment("train", None)
        if epoch == warm_ep:
            dp.restore_train_augment()
            if self.focal_fn is not None:
                lossfn = self.focal_fn
            if primary and self.mixup_ratio > 0 and self.mixup_duration > 0:
                self.logger.both("Mixup start up")
        mixup_active = (
            self.mixup_ratio > 0
            and self.mixup_duration > 0
            and warm_ep <= epoch < warm_ep + self.mixup_duration
        )
        if (
            self.mixup_ratio > 0 and self.mixup_duration > 0
            and epoch == warm_ep + self.mixup_duration and primary
        ):
            self.logger.both("Mixup end")
        dp.auto_aug_weaken(epoch, milestone=aug_epoch)
        if self.prog_learn:
            for node, size in zip(self.resize_chnodes, self.imgsz_milestone):
                if epoch == node:
                    device_cfg_changed = dp.set_train_size(size)
                    if device_cfg_changed and self.device_augment_fn is not None:
                        # a lifted random_crop carries a static size: rebuild
                        # the compiled stage at the new size and drop cached
                        # steps that closed over the old fn (ADVICE r4)
                        from visiondk_tpu.ops.device_augment import (
                            make_device_augment,
                        )

                        self.device_augment_fn = make_device_augment(
                            dp.device_augment_cfg,
                            group_size=self.device_augment_group_size,
                        )
                        # drop every cached step (they closed over the old
                        # fn; their old-shape jit traces are dead after the
                        # resize anyway)
                        self._step_cache.clear()
                    if primary:
                        self.logger.both(f"progressive resize -> {size}")
        return lossfn, mixup_active

    # --------------------------------------------------------- classification

    def run_classifier(self, resume: Optional[str] = None) -> Dict[str, Any]:
        hyp, data_cfg = self.hyp_cfg, self.data_cfg
        epochs, warm_ep = hyp["epochs"], hyp["warm_ep"]
        aug_epoch = data_cfg["train"].get("aug_epoch", epochs)
        logger = self.logger
        dp = self.data_processor
        primary = self.mesh.is_primary()

        global_bs = data_cfg["train"]["bs"]
        train_loader = dp.dataloader(
            "train", self._local_bs(global_bs), seed=self.seed,
            process_index=jax.process_index(), process_count=jax.process_count(),
        )
        # multi-host stance: val is REPLICATED (every process, identical full
        # set, primary-only artifacts) — checked against the loader actually
        # built, not against assumed literals
        val_loader = dp.dataloader("val", data_cfg["val"]["bs"])
        # both loader types declare these (data/loader.py DataLoader,
        # dataprocessor._LabeledAdapter) — no permissive getattr defaults, a
        # loader without the attributes is a bug the AttributeError surfaces
        self.mesh.check_replicated_eval(
            shuffle=bool(val_loader.shuffle),
            process_sharded=int(val_loader.process_count) > 1,
            logger=logger,
        )
        steps_per_epoch = max(len(train_loader), 1)

        if primary:
            from visiondk_tpu.data.datasets import tell_data_distribution

            # combined train+val table (reference basedataset.py:256-306);
            # reference prints to console only for ≤50 classes
            _, table = tell_data_distribution(
                {"train": dp.train_dataset, "val": dp.val_dataset}
            )
            msg = "\n" + table
            if self.model_cfg["num_classes"] <= 50:
                logger.both(msg)
            else:
                logger.log(msg)

        tx = self._build_tx(steps_per_epoch, discrete_per_epoch=True)
        state = self._init_state(tx, (global_bs, self.imgsz, self.imgsz, 3))
        eval_step = make_eval_step(
            self.model,
            StepConfig(mean=dp.normalization[0], std=dp.normalization[1]),
            use_ema=True,
        )

        best_fitness, start_epoch = 0.0, 0
        if resume:
            state, meta = self.ckpt.restore(resume, state)
            start_epoch = meta["epoch"] + 1
            best_fitness = meta["best_fitness"]
            if primary:
                logger.both(f"resume: {resume} (epoch {start_epoch})")
                if meta.get("meta_missing"):
                    logger.both(
                        f"WARNING resume: {resume} has no meta.json — epoch and "
                        "best_fitness are unknown; restarting the schedule at "
                        "epoch 0 with the restored weights"
                    )
        elif self.model_cfg.get("load_from"):
            state = self._apply_load_from(state, self.model_cfg["load_from"])
        if not resume and self.model_cfg.get("convert_npz"):
            state = self._apply_convert_npz(state, self.model_cfg["convert_npz"])

        num_classes = self.model_cfg["num_classes"]
        lossfn = self.lossfn
        if primary:
            head = (
                f"{'Epoch':>10}{'train_loss':>12}{'val_loss':>12}{'top1':>10}{'top5':>10}"
                if self.thresh == 0
                else f"{'Epoch':>10}{'train_loss':>12}{'val_loss':>12}{'precision':>12}{'recall':>10}{'f1':>10}"
            )
            logger.console(head)

        # -- resume: replay strategy milestones for the skipped epochs so the
        # augment pipeline / focal swap / progressive size match an
        # uninterrupted run (reference's latent bug: vision_engine.py:344-375)
        for past in range(min(start_epoch, epochs)):
            lossfn, _ = self._epoch_strategy(past, lossfn, aug_epoch, log=False)

        t0 = time.time()
        last_metrics: Dict[str, Any] = {}
        for epoch in range(start_epoch, epochs):
            # -- strategy control (vision_engine.py:344-375)
            lossfn, mixup_active = self._epoch_strategy(epoch, lossfn, aug_epoch)

            # device augments are live exactly when host train augments are:
            # epochs [warm_ep, aug_epoch) — epoch 0..warm_ep uses val augments
            # (reference warmup), aug_epoch onward is weakened to val augments
            dev_aug = (
                self.device_augment_fn is not None
                and warm_ep <= epoch < aug_epoch
            )
            loss_key = "focal" if (lossfn is self.focal_fn) else self.loss_choice
            step = self._get_train_step(
                tx, (loss_key, mixup_active, dev_aug), lossfn, mixup_active,
                device_aug=dev_aug,
            )

            train_loader.set_epoch(epoch)
            epoch_t0 = time.time()
            n_images = 0
            # losses stay on device; ONE host fetch per epoch. A per-step
            # float() would sync host↔device every step and stall the
            # dispatch pipeline.
            step_losses = []

            def _put(i, batch, _epoch=epoch, _mix=mixup_active):
                # sequence seeding: collision-free for any (seed, epoch, step),
                # unlike arithmetic mixing which collides past 10k steps/epoch
                lam = (
                    float(np.random.default_rng([self.seed, _epoch, i]).beta(
                        self.mixup_ratio, self.mixup_ratio
                    ))
                    if _mix
                    else 0.0
                )
                return (
                    self._shard_batch(batch),
                    jax.device_put(np.float32(lam), self.mesh.replicated),
                    batch["image"].shape[0],
                )

            # hold_first: the feeder parks until the epoch's first step has
            # returned from (a possibly minutes-long remote) compile — the
            # tunneled dev backend is not trusted with concurrent calls
            # during one (see DevicePrefetcher)
            feed = DevicePrefetcher(
                train_loader, _put, self.device_prefetch_depth, hold_first=True
            )
            for dev_batch, dev_lam, rows in feed:
                state, metrics = step(state, dev_batch, dev_lam)
                feed.release()
                step_losses.append(metrics["loss"])
                n_images += rows
            tloss = float(jnp.mean(jnp.stack(step_losses))) if step_losses else 0.0
            epoch_secs = time.time() - epoch_t0

            # -- EMA validation (train.py:127-143)
            val_metrics = cls_eval.valuate(
                eval_step, state, val_loader, num_classes,
                thresh=self.thresh if self.loss_choice == "bce" else None,
                lossfn=lossfn,
                class_names=dp.val_dataset.class_names,
            )
            fitness = val_metrics["fitness"]
            last_metrics = val_metrics
            if primary:
                if self.thresh == 0:
                    logger.console(
                        f"{epoch + 1:>6}/{epochs:<3}{tloss:>12.4g}"
                        f"{val_metrics.get('v_loss', float('nan')):>12.4g}"
                        f"{val_metrics['top1']:>10.3g}{val_metrics.get('top5', 0.0):>10.3g}"
                    )
                else:
                    logger.console(
                        f"{epoch + 1:>6}/{epochs:<3}{tloss:>12.4g}"
                        f"{val_metrics.get('v_loss', float('nan')):>12.4g}"
                        f"{val_metrics['precision']:>12.3g}{val_metrics['recall']:>10.3g}"
                        f"{val_metrics['f1score']:>10.3g}"
                    )
                logger.log(
                    f"epoch:{epoch + 1} t_loss:{tloss:.4f} fitness:{fitness:.4f}"
                    f" imgs/s:{n_images / max(epoch_secs, 1e-9):.1f}"
                )
                if self.metrics_writer is not None:
                    w = self.metrics_writer
                    w.add_scalar("Train_loss", tloss, epoch)
                    w.add_scalar("Train_images_per_sec", n_images / max(epoch_secs, 1e-9), epoch)
                    if self._lr_fn is not None:
                        w.add_scalar("Train_lr", float(self._lr_fn(int(state.step))), epoch)
                    for k in ("top1", "top5", "precision", "recall", "f1score", "v_loss"):
                        if k in val_metrics:
                            w.add_scalar(f"Val_{k}", float(val_metrics[k]), epoch)
                    w.flush()

            # -- checkpoints (vision_engine.py:386-403). Called by ALL
            # processes: orbax save() synchronizes globally and each host
            # writes its own shards (required once the partial-FC head is
            # 'model'-sharded across hosts); primary-only calls would
            # deadlock in orbax's save barrier. fitness is identical on
            # every process (val is replicated), so best/last agree.
            self.ckpt.save("last", state, epoch, max(best_fitness, fitness))
            if fitness > best_fitness:
                best_fitness = fitness
                self.ckpt.save("best", state, epoch, best_fitness)

        self.ckpt.wait()  # join any in-flight async save before reporting done
        if primary:
            hours = (time.time() - t0) / 3600
            logger.both(
                f"\n{epochs - start_epoch} epochs completed in {hours:.3f} hours."
            )
            logger.console(
                colorstr("Validate:")
                + f" python validate.py --cfgs {self.project / 'config.yaml'}"
                f" --weight {self.project / 'best'} --ema"
            )
        return {"best_fitness": best_fitness, **last_metrics}

    # ------------------------------------------------------------ embedding

    def run_embedding(
        self, resume: Optional[str] = None, save_freq: int = 1, print_freq: int = 50
    ) -> Dict[str, Any]:
        hyp, data_cfg = self.hyp_cfg, self.data_cfg
        epochs, warm_ep = hyp["epochs"], hyp["warm_ep"]
        logger = self.logger
        dp = self.data_processor
        primary = self.mesh.is_primary()

        global_bs = data_cfg["train"]["bs"]
        train_loader = dp.dataloader(
            "train", self._local_bs(global_bs), seed=self.seed,
            process_index=jax.process_index(), process_count=jax.process_count(),
        )
        steps_per_epoch = max(len(train_loader), 1)

        # batch-wise schedule horizon (vision_engine.py:486-489)
        tx = self._build_tx(steps_per_epoch, discrete_per_epoch=False)
        state = self._init_state(tx, (global_bs, self.imgsz, self.imgsz, 3))
        embed_step = make_embed_step(
            self.model,
            StepConfig(mean=dp.normalization[0], std=dp.normalization[1]),
            use_ema=True,
        )

        best_fitness, start_epoch = 0.0, 0
        if resume:
            state, meta = self.ckpt.restore(resume, state)
            start_epoch = meta["epoch"] + 1
            best_fitness = meta.get("best_fitness", 0.0)
            if primary:
                logger.both(f"resume: {resume} (epoch {start_epoch})")
                if meta.get("meta_missing"):
                    logger.both(
                        f"WARNING resume: {resume} has no meta.json — epoch and "
                        "best_fitness are unknown; restarting the schedule at "
                        "epoch 0 with the restored weights"
                    )
        elif self.model_cfg.get("load_from"):
            state = self._apply_load_from(state, self.model_cfg["load_from"])
        if not resume and self.model_cfg.get("convert_npz"):
            state = self._apply_convert_npz(state, self.model_cfg["convert_npz"])

        # embedding path has no warmup/weaken augment strategy (reference
        # vision_engine.py:438-561): device augments are live every epoch
        dev_aug = self.device_augment_fn is not None
        step = self._get_train_step(
            tx, ("embed", False, dev_aug), self.lossfn, mixup=False,
            device_aug=dev_aug,
        )
        loss_meter = AverageMeter()
        fitness_metrics: Dict[str, Any] = {}
        zero_lam = jax.device_put(np.float32(0.0), self.mesh.replicated)

        def _put(i, batch):
            return self._shard_batch(batch), batch["image"].shape[0]

        for epoch in range(start_epoch, epochs):
            train_loader.set_epoch(epoch)
            loss_meter.reset()
            epoch_t0 = time.time()
            n_images = 0
            pending = []  # device losses; fetched only at print_freq/epoch end
            feed = DevicePrefetcher(
                train_loader, _put, self.device_prefetch_depth, hold_first=True
            )
            for i, (dev_batch, rows) in enumerate(feed):
                state, metrics = step(state, dev_batch, zero_lam)
                feed.release()
                pending.append((metrics["loss"], rows))
                n_images += rows
                # print_freq cadence (reference train.py:235-242)
                if primary and (i + 1) % print_freq == 0:
                    for dev_loss, n in pending:
                        loss_meter.update(float(dev_loss), n=n)
                    pending.clear()
                    steps_done = epoch * steps_per_epoch + i + 1
                    lr = float(self._lr_fn(steps_done)) if self._lr_fn else float("nan")
                    logger.console(
                        f"epoch:{epoch + 1}/{epochs} batch:{i + 1} "
                        f"loss:{loss_meter.avg:.4f} lr:{lr:.3g}"
                    )
                    if self.metrics_writer is not None:
                        self.metrics_writer.add_scalar("Train_loss", loss_meter.avg, steps_done)
                        self.metrics_writer.add_scalar("Train_lr", lr, steps_done)
            for dev_loss, n in pending:
                loss_meter.update(float(dev_loss), n=n)
            epoch_secs = time.time() - epoch_t0
            if primary:
                logger.both(
                    f"epoch:{epoch + 1}/{epochs} loss:{loss_meter.avg:.4f}"
                    f" imgs/s:{n_images / max(epoch_secs, 1e-9):.1f}"
                )

            if (epoch + 1) % save_freq == 0 or epoch == epochs - 1:
                fitness_metrics = self._eval_embedding(embed_step, state)
                # fitness scalar: pair-verification mean (face) or the first
                # retrieval metric, MRR@smallest-cutoff (CBIR)
                fitness = float(
                    fitness_metrics["mean"]
                    if "mean" in fitness_metrics
                    else next(iter(fitness_metrics.values()))
                )
                if primary:
                    logger.both(fitness_metrics)
                    if self.metrics_writer is not None:
                        for k, v in fitness_metrics.items():
                            self.metrics_writer.add_scalar(f"Val_{k}", float(v), epoch)
                        self.metrics_writer.flush()
                # saves on ALL processes (orbax save() barriers globally —
                # see run_classifier's checkpoint note); eval is replicated
                # so fitness/best agree everywhere
                self.ckpt.save(
                    f"Epoch_{epoch + 1}", state, epoch, max(best_fitness, fitness),
                    extra={"fitness": {k: float(v) for k, v in fitness_metrics.items()}},
                )
                if fitness > best_fitness:
                    best_fitness = fitness
                    self.ckpt.save("best", state, epoch, best_fitness)
                self.ckpt.save("last", state, epoch, best_fitness)
        self.ckpt.wait()  # join any in-flight async save before reporting done
        return fitness_metrics

    def _eval_embedding(self, embed_step, state) -> Dict[str, Any]:
        from visiondk_tpu.data.datasets import CBIRDatasets
        from visiondk_tpu.data.transforms import create_aug_transforms

        # multi-host stance: embedding eval is REPLICATED — each process embeds
        # the full query/gallery (identical inputs ⇒ identical retrieval
        # metrics everywhere); primary-only checkpoint/logging happens in the
        # caller. The values here are true BY CONSTRUCTION of the eval loaders
        # (face_eval.py builds shuffle=False/no process sharding at :111,
        # cbir_eval.py at :186); this call exists for the rationale + the
        # primary-only log line, not as a runtime guard.
        self.mesh.check_replicated_eval(shuffle=False, process_sharded=False,
                                        logger=self.logger)
        val_aug = create_aug_transforms(self.data_cfg["val"]["augment"])
        if self.task == "face":
            pair_txt = self.data_cfg["val"]["pair_txt"]
            mean, sem = face_eval.valuate(
                embed_step, state, pair_txt, self.data_cfg["root"], val_aug,
                batch_size=self.data_cfg["val"]["bs"],
            )
            return {"mean": mean, "std": sem}
        query, gallery = CBIRDatasets.build(self.data_cfg["root"], transforms=val_aug)
        mcfg = self.data_cfg["val"].get("metrics", {})
        return cbir_eval.valuate(
            embed_step, state, query, gallery,
            batch_size=self.data_cfg["val"]["bs"],
            metrics=mcfg.get("metrics", ["mrr", "recall", "precision", "auc", "ndcg"]),
            cutoffs=mcfg.get("cutoffs", [1, 3, 5]),
            # approx retrieval (lax.approx_max_k) when the config asks for it
            recall_target=mcfg.get("recall_target"),
            mesh=self.mesh.mesh,
            # NOT used during training (the model changes every epoch); only a
            # config-forced path enables it, mirroring the reference's opt-in
            gallery_cache=self.data_cfg["val"].get("embedding_cache"),
        )

    # ------------------------------------------------------------ load_from

    def _apply_convert_npz(self, state: TrainState, path: str) -> TrainState:
        """Initialize from a torch-converted .npz (tools/convert_torch_weights)
        — the framework's pretrained-weights path (reference uses timm
        downloads, classify_model.py:37-54)."""
        from visiondk_tpu.models.convert import load_converted, merge_converted
        from visiondk_tpu.models.ema import init_ema

        converted = load_converted(path)
        # backbone-only checkpoints land under the backbone submodule
        prefix = "backbone/" if "backbone" in state.params else ""
        params, bstats = merge_converted(
            state.params, state.batch_stats, converted,
            logger=self.logger if self.mesh.is_primary() else None,
            strip_prefix=prefix,
        )
        return state.replace(
            params=params,
            batch_stats=bstats,
            ema_params=init_ema(params),
            ema_batch_stats=init_ema(bstats),
        )

    def _apply_load_from(self, state: TrainState, path: str) -> TrainState:
        tmp_mgr = CheckpointManager(Path(path).parent)
        # partial restore — ONLY ema_params. A full-state restore would use
        # this run's opt_state as template, which need not match the saving
        # run's (e.g. hyp.accumulate wraps it in MultiStepsState); the
        # fine-tune source's optimizer is irrelevant anyway.
        restored = tmp_mgr.restore_partial(
            Path(path).name, {"ema_params": state.ema_params}
        )
        head_classes = None
        if self.task in ("face", "cbir"):
            # anchor for the padded-head column graft: only a checkpoint with
            # exactly this many head columns may load into the padded weight
            head_classes = int(
                next(iter(self.model_cfg["head"].values()))["num_class"]
            )
        params = CheckpointManager.load_from(
            state.params, restored["ema_params"], logger=self.logger,
            prefix="ema ", head_classes=head_classes,
        )
        if self.mesh.is_primary():
            self.logger.both(f"load_from: {path}")
        from visiondk_tpu.models.ema import init_ema

        # init_ema copies — params/ema_params must not alias (step donation).
        return state.replace(params=params, ema_params=init_ema(params))
