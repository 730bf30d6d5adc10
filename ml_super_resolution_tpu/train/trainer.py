"""The single-loop training/eval engine shared by every non-GAN model.

Replaces the reference's per-paper hand-written ``session.run`` loops
(SURVEY §3.1) with one jitted step: on-device crop/augment/degrade
(``ops/patches``), forward, MSE loss, backward, optax update, EMA — one XLA
program, state donated, batch sharded over the ``data`` mesh axis (P1 of
SURVEY §2b).  The host's only per-step work is handing over a uint8 tile
batch and (every ``log_every``) reading back a scalar.

TPU specifics:
* grads/updates run where the data lives; with ``dp > 1`` XLA inserts the
  gradient ``psum`` over ICI from the sharding annotations alone.
* optional bf16 trunk compute (params and optimizer state stay f32).
* eval PSNR/SSIM computed on device (K4), per-shape compile cache.
"""

from __future__ import annotations

import time
from functools import partial
from pathlib import Path
from typing import Any, Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ml_super_resolution_tpu.models import MODEL_SPECS, build_model
from ml_super_resolution_tpu.ops.metrics import psnr, ssim
from ml_super_resolution_tpu.ops.patches import eval_pair, training_pairs
from ml_super_resolution_tpu.ops.color import rgb_to_y
from ml_super_resolution_tpu.train.checkpoint import CheckpointManager
from ml_super_resolution_tpu.utils.config import ExperimentConfig
from ml_super_resolution_tpu.utils.logging import MetricsLogger


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any  # == params pytree, or None when EMA disabled
    rng: jax.Array


def make_optimizer(cfg) -> optax.GradientTransformation:
    lr: Any = cfg.learning_rate
    if cfg.lr_decay_steps > 0:
        lr = optax.exponential_decay(
            cfg.learning_rate,
            cfg.lr_decay_steps,
            cfg.lr_decay_rate,
            staircase=True,
        )
    chain = []
    if cfg.grad_clip_norm > 0:
        # VDSR's high-LR + clipping protocol (arXiv:1511.04587 §3.3).
        chain.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
    if cfg.weight_decay > 0:
        chain.append(optax.adamw(lr, weight_decay=cfg.weight_decay))
    else:
        chain.append(optax.adam(lr))
    return optax.chain(*chain)


class Trainer:
    def __init__(self, cfg: ExperimentConfig, workdir: str | Path | None = None):
        self.cfg = cfg
        self.spec = MODEL_SPECS[cfg.model.name]
        overrides = dict(cfg.model.overrides)
        if cfg.train.bf16:
            overrides.setdefault("dtype", jnp.bfloat16)
        self.model = build_model(
            cfg.model if not overrides else cfg.model.__class__(
                name=cfg.model.name,
                scale=cfg.model.scale,
                channels=cfg.model.channels,
                overrides=overrides,
            )
        )
        self.tx = make_optimizer(cfg.train)

        if jax.process_count() > 1:
            # Multi-host DP (SURVEY §5.8): (dcn, data) mesh, slow axis
            # outermost; each process feeds its local shard of the global
            # batch (see _put_batch).  --dp is ignored: every device joins.
            from ml_super_resolution_tpu.parallel.distributed import (
                make_multihost_mesh,
            )

            self.mesh = make_multihost_mesh()
            self.batch_sharding = NamedSharding(self.mesh, P(("dcn", "data")))
        else:
            if cfg.train.dp:
                # an explicitly requested dp must be honored exactly —
                # silently training at a different parallelism is a lie
                if cfg.data.batch_size % cfg.train.dp:
                    raise ValueError(
                        f"--dp {cfg.train.dp} does not divide batch size "
                        f"{cfg.data.batch_size}"
                    )
                dp = cfg.train.dp
            else:
                dp = len(jax.devices())
                # the batch shards over 'data': use the largest device count
                # that divides it (a 4-image debug batch on 8 devices -> dp=4)
                while cfg.data.batch_size % dp:
                    dp -= 1
            self.mesh = Mesh(np.asarray(jax.devices()[:dp]).reshape(dp), ("data",))
            self.batch_sharding = NamedSharding(self.mesh, P("data"))
        self.replicated = NamedSharding(self.mesh, P())

        self.workdir = Path(workdir) if workdir else None
        self.logger = MetricsLogger(self.workdir, echo=True)
        self.ckpt: CheckpointManager | None = None
        self.ckpt_best: CheckpointManager | None = None
        if self.workdir:
            self.ckpt = CheckpointManager(
                self.workdir / cfg.train.ckpt_dir, cfg.train.max_to_keep
            )
            self.ckpt.save_config(cfg)
            # Best-PSNR retention (SURVEY §5.4): <workdir>/best holds the
            # single checkpoint with the highest eval PSNR seen so far, with
            # the winning metrics beside it in best.json.
            self.ckpt_best = CheckpointManager(self.workdir / "best", max_to_keep=1)

        if cfg.train.debug_nans:
            jax.config.update("jax_debug_nans", True)

        self._train_step = jax.jit(
            self._step_impl,
            donate_argnums=(0,),
            in_shardings=(self.replicated, self.batch_sharding),
            out_shardings=(self.replicated, self.replicated),
        )
        # Multi-step dispatch (TrainConfig.steps_per_call): one jitted call
        # scans K stacked batches — K-fold fewer host->device round trips,
        # bit-identical step math (same per-step RNG fold_in chain).
        if jax.process_count() > 1:
            stack_spec = P(None, ("dcn", "data"))
        else:
            stack_spec = P(None, "data")
        self.stack_sharding = NamedSharding(self.mesh, stack_spec)
        self._train_step_scan = jax.jit(
            self._multi_step_impl,
            donate_argnums=(0,),
            in_shardings=(self.replicated, self.stack_sharding),
            out_shardings=(self.replicated, self.replicated),
        )
        self._device_step = jax.jit(
            self._device_step_impl,
            donate_argnums=(0,),
            in_shardings=(self.replicated, self.replicated),
            out_shardings=(self.replicated, self.replicated),
        )
        self._device_multi = jax.jit(
            self._device_multi_impl,
            static_argnums=(2,),
            donate_argnums=(0,),
            in_shardings=(self.replicated, self.replicated),
            out_shardings=(self.replicated, self.replicated),
        )
        self._eval_apply = jax.jit(self._eval_forward)
        self._eval_apply_ens = None  # built lazily on first ensemble eval

    # ------------------------------------------------------------- state --
    def init_state(self, seed: int = 0) -> TrainState:
        c = self.cfg
        patch = c.data.patch_size
        in_patch = patch // c.model.scale if self.spec["lr_space"] else patch
        dummy = jnp.zeros((1, in_patch, in_patch, c.model.channels), jnp.float32)
        variables = self.model.init(jax.random.key(seed), dummy, train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=self.tx.init(params),
            ema_params=params if c.train.ema_decay > 0 else None,
            # old-style uint32 key: serializes through Orbax StandardSave
            rng=jax.random.PRNGKey(seed),
        )
        return jax.device_put(state, self.replicated)

    @property
    def n_params(self) -> int:
        # counts from an abstract init — no device work
        c = self.cfg
        patch = c.data.patch_size
        in_patch = patch // c.model.scale if self.spec["lr_space"] else patch
        dummy = jax.ShapeDtypeStruct((1, in_patch, in_patch, c.model.channels), jnp.float32)
        variables = jax.eval_shape(
            partial(self.model.init, train=False), jax.random.key(0), dummy
        )
        return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))

    # -------------------------------------------------------------- step --
    def _loss_fn(self, params, batch_stats, lr_batch, hr_batch, train: bool):
        import contextlib

        if self.cfg.train.qat and train:
            # QAT (quant.py): the training forward sees the int8 rounding
            # the PTQ inference path will apply; STE gradients reach the
            # f32 params.  Eval and checkpoints stay float.
            from ml_super_resolution_tpu.quant import qat_intercept, qat_params

            params = qat_params(params)
            ctx = qat_intercept()
        else:
            ctx = contextlib.nullcontext()
        variables = {"params": params}
        with ctx:
            if batch_stats:
                variables["batch_stats"] = batch_stats
                out, mutated = self.model.apply(
                    variables, lr_batch, train=train, mutable=["batch_stats"]
                )
                new_stats = mutated["batch_stats"]
            else:
                out = self.model.apply(variables, lr_batch, train=train)
                new_stats = batch_stats
        if self.cfg.train.loss == "l1":
            loss = jnp.mean(jnp.abs(out - hr_batch))
        else:
            loss = jnp.mean(jnp.square(out - hr_batch))
        return loss, (new_stats, out)

    def _step_impl(self, state: TrainState, tiles: jnp.ndarray):
        c = self.cfg
        key = jax.random.fold_in(state.rng, state.step)
        use_k3 = (
            c.train.pallas_preprocess
            and c.model.channels == 1
            and not c.data.scales
        )
        if use_k3:
            # K3 (SURVEY §2b): crop/augment on device, then the fused Pallas
            # luma+degrade kernel instead of the XLA ops path.  Data path
            # only — no gradients flow through it.
            from ml_super_resolution_tpu.kernels.preprocess import preprocess_pairs
            from ml_super_resolution_tpu.ops.patches import random_hr_patches
            from ml_super_resolution_tpu.ops.resize import imresize

            t = tiles.astype(jnp.float32) / 255.0 if tiles.dtype == jnp.uint8 else tiles
            hr_rgb = random_hr_patches(
                key, t, c.data.patch_size, c.model.scale, c.data.augment
            )
            hr_batch, lr_batch = preprocess_pairs(hr_rgb, c.model.scale)
            if not self.spec["lr_space"]:
                lr_batch = imresize(lr_batch, scale=float(c.model.scale))
        elif c.data.scales and not self.spec["lr_space"]:
            from ml_super_resolution_tpu.ops.patches import training_pairs_multiscale

            lr_batch, hr_batch = training_pairs_multiscale(
                key,
                tiles,
                patch_size=c.data.patch_size,
                scales=tuple(c.data.scales),
                y_only=c.model.channels == 1,
                augment=c.data.augment,
            )
        else:
            lr_batch, hr_batch = training_pairs(
                key,
                tiles,
                patch_size=c.data.patch_size,
                scale=c.model.scale,
                y_only=c.model.channels == 1,
                lr_space=self.spec["lr_space"],
                augment=c.data.augment,
            )
        (loss, (new_stats, _)), grads = jax.value_and_grad(
            self._loss_fn, has_aux=True
        )(state.params, state.batch_stats, lr_batch, hr_batch, True)
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None:
            d = c.train.ema_decay
            ema = jax.tree.map(lambda e, p: d * e + (1 - d) * p, ema, new_params)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
        }
        return (
            state.replace(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt,
                ema_params=ema,
            ),
            metrics,
        )

    def _multi_step_impl(self, state: TrainState, tiles_stack: jnp.ndarray):
        """K sequential steps under one dispatch: scan over the leading dim.

        Returns the final state and the LAST step's metrics (matching what
        a sequential caller would log at the same step index).
        """
        state, metrics = jax.lax.scan(
            lambda s, t: self._step_impl(s, t), state, tiles_stack
        )
        return state, jax.tree.map(lambda m: m[-1], metrics)

    # ------------------------------------------- device-resident dataset --
    def _device_step_impl(self, state: TrainState, images: jnp.ndarray):
        tiles = sample_device_tiles(
            state.rng, state.step, images,
            self.cfg.data.tile_size, self.cfg.data.batch_size,
        )
        return self._step_impl(state, tiles)

    def _device_multi_impl(self, state: TrainState, images: jnp.ndarray, k: int):
        state, metrics = jax.lax.scan(
            lambda s, _: self._device_step_impl(s, images), state, None, length=k
        )
        return state, jax.tree.map(lambda m: m[-1], metrics)

    def stage_device_images(self, dataset) -> jnp.ndarray:
        return stage_device_images(
            dataset, self.cfg.data.tile_size, self.replicated, self.logger
        )

    def train_step(self, state: TrainState, tiles: np.ndarray):
        """One jitted step; ``tiles`` is a uint8 (N, T, T, 3) host batch."""
        return self._train_step(state, tiles)

    def _put_batch(self, batch: np.ndarray):
        return put_batch(self.batch_sharding, batch)

    # -------------------------------------------------------------- eval --
    def _eval_forward(self, params, batch_stats, lr_img):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        return self.model.apply(variables, lr_img[None], train=False)[0]

    def _eval_forward_ens(self, params, batch_stats, lr_img):
        """D4 self-ensemble eval forward (EDSR+): mean of the 8 dihedral
        predictions, all traced inside one jit (two static orientations)."""
        from ml_super_resolution_tpu.infer import d4_ensemble

        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats

        def ap(batch):
            return self.model.apply(variables, batch, train=False)

        return d4_ensemble(ap)(lr_img[None])[0]

    def eval_params(self, state: TrainState):
        return state.ema_params if state.ema_params is not None else state.params

    def eval_previews(
        self, state: TrainState, image: np.ndarray, scale: int | None = None
    ) -> dict[str, np.ndarray]:
        """(bicubic, sr, hr) uint8 triplet for one eval image — the image
        summaries of SURVEY §5.5 (grayscale for Y-channel models)."""
        from ml_super_resolution_tpu.ops.resize import imresize

        c = self.cfg
        scale = scale or c.model.scale
        lr_img, hr_img = eval_pair(
            jnp.asarray(image), scale, y_only=c.model.channels == 1,
            lr_space=self.spec["lr_space"],
        )
        sr = self._eval_apply(self.eval_params(state), state.batch_stats, lr_img)
        bic = (imresize(lr_img, scale=float(scale))
               if self.spec["lr_space"] else lr_img)  # HR-space input IS bicubic

        def to_u8(a):
            return np.asarray(
                jnp.round(jnp.clip(a, 0.0, 1.0) * 255.0).astype(jnp.uint8))

        return {"bicubic": to_u8(bic), "sr": to_u8(sr), "hr": to_u8(hr_img)}

    def evaluate(
        self, state: TrainState, images: Sequence[np.ndarray],
        scale: int | None = None, ensemble: bool = False,
        int8: bool = False, perceptual=None,
    ) -> dict[str, float]:
        """Protocol eval: Y-channel PSNR/SSIM with ``scale``-px shave.

        ``int8`` scores the PTQ-quantized forward (quant.py), calibrated on
        the first eval image — the honest way to report the int8 PSNR delta
        against this same method's float numbers.

        ``perceptual``: FeatureNet params pytree (models/featurenet.py);
        adds ``featnet`` = mean feature-space MSE vs HR (lower is better),
        the metric counterpart of the SRGAN perceptual loss."""
        c = self.cfg
        scale = scale or c.model.scale
        y_only = c.model.channels == 1
        params = self.eval_params(state)
        if ensemble and self._eval_apply_ens is None:
            self._eval_apply_ens = jax.jit(self._eval_forward_ens)
        fwd = self._eval_apply_ens if ensemble else self._eval_apply
        if int8:
            from ml_super_resolution_tpu.infer import d4_ensemble
            from ml_super_resolution_tpu.quant import int8_apply_fn

            lr0, _ = eval_pair(
                jnp.asarray(images[0]), scale, y_only=y_only,
                lr_space=self.spec["lr_space"])
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            qfn = int8_apply_fn(self.model, variables, c.model.name, scale,
                                lr0[None])
            net = d4_ensemble(qfn) if ensemble else qfn
            fwd = lambda p, bs, lr: net(lr[None])[0]
        feat_fn = None
        if perceptual is not None:
            from ml_super_resolution_tpu.models.featurenet import (
                feature_distance,
            )

            feat_fn = jax.jit(partial(feature_distance, perceptual))
        psnrs, ssims, feats = [], [], []
        for img in images:
            lr_img, hr_img = eval_pair(
                jnp.asarray(img), scale, y_only=y_only, lr_space=self.spec["lr_space"]
            )
            sr = fwd(params, state.batch_stats, lr_img)
            sr = jnp.clip(sr, 0.0, 1.0)
            if feat_fn is not None:  # on full color, before the luma protocol
                feats.append(feat_fn(sr, hr_img))
            if not y_only:  # score on luma (SISR protocol)
                sr, hr_img = rgb_to_y(sr), rgb_to_y(hr_img)
            psnrs.append(psnr(sr, hr_img, border=scale))
            ssims.append(ssim(sr, hr_img, border=scale))
        out = {
            "psnr": float(np.mean([np.asarray(p) for p in psnrs])),
            "ssim": float(np.mean([np.asarray(s) for s in ssims])),
        }
        if feats:
            out["featnet"] = float(np.mean([np.asarray(f) for f in feats]))
        return out

    # --------------------------------------------------------------- fit --
    def fit(
        self,
        loader: Iterable[np.ndarray],
        eval_images: Sequence[np.ndarray] | None = None,
        steps: int | None = None,
        seed: int = 0,
    ) -> TrainState:
        c = self.cfg
        steps = steps or c.train.steps
        state = self.init_state(seed)
        start_step = 0
        if self.ckpt and c.train.resume:
            restored = self.ckpt.restore_latest(state)
            if restored is not None:
                state, start_step = restored
                self.logger.log("resume", start_step)

        # Chunk schedule: steps_per_call full scans, then single-step tail.
        # (K=1 degenerates to the classic one-step loop.)
        kk = max(1, c.train.steps_per_call)
        todo = steps - start_step
        schedule = [kk] * (todo // kk) + [1] * (todo % kk)

        # Device prefetch: the uint8 tile stack is the loop's only
        # host->device transfer; stage the next one onto the device while
        # the current call computes (SURVEY §3.5 "one transfer per batch").
        def grab(raw_it, k):
            if k == 1:
                return 1, self._put_batch(next(raw_it))
            stack = np.stack([next(raw_it) for _ in range(k)])
            return k, put_batch(self.stack_sharding, stack)

        def prefetched(raw_it, sched):
            si = iter(sched)
            try:
                nxt = grab(raw_it, next(si))
            except StopIteration:
                return
            while True:
                cur = nxt
                try:
                    nxt = grab(raw_it, next(si))
                except StopIteration:
                    yield cur
                    return
                yield cur

        def crossed(new_step, old_step, every):
            # every <= 0 disables the periodic action entirely
            return every > 0 and new_step // every > old_step // every

        if c.data.device_dataset:
            # Device-resident corpus: no host batches at all.  The loader is
            # only used as a handle to its dataset (never started).
            images = self.stage_device_images(loader.dataset)
            it = ((k, None) for k in schedule)
        else:
            images = None
            it = prefetched(iter(loader), schedule)
        best_psnr = self._load_best_psnr()
        t0 = time.perf_counter()
        step = start_step
        since_log = 0
        for k, tiles in it:
            if tiles is None:
                if k == 1:
                    state, metrics = self._device_step(state, images)
                else:
                    state, metrics = self._device_multi(state, images, k)
            elif k == 1:
                state, metrics = self.train_step(state, tiles)
            else:
                state, metrics = self._train_step_scan(state, tiles)
            prev, step = step, step + k
            since_log += k
            if crossed(step, prev, c.train.log_every) or prev == start_step == 0:
                m = {key: float(v) for key, v in metrics.items()}
                dt = time.perf_counter() - t0
                t0 = time.perf_counter()
                self.logger.log(
                    "train", step, **m, steps_per_s=since_log / dt
                )
                since_log = 0
            if eval_images and crossed(step, prev, c.train.eval_every):
                ev = self.evaluate(state, eval_images)
                # joint multi-scale training (VDSR): log EVERY trained scale
                # per eval so per-scale convergence is visible in the curve,
                # not just in a final `sr eval --scales` snapshot
                for s_ in c.data.scales or ():
                    if s_ != c.model.scale:
                        es = self.evaluate(state, eval_images, scale=s_)
                        ev[f"psnr_x{s_}"] = es["psnr"]
                        ev[f"ssim_x{s_}"] = es["ssim"]
                self.logger.log("eval", step, **ev)
                if c.train.previews:
                    self.logger.log_images(
                        "eval", step, **self.eval_previews(state, eval_images[0])
                    )
                best_psnr = self._maybe_save_best(step, state, ev, best_psnr)
            if self.ckpt and crossed(step, prev, c.train.ckpt_every):
                self.ckpt.save(step, jax.device_get(state))
        if self.ckpt:
            self.ckpt.save(steps, jax.device_get(state))
            self.ckpt.wait()
        if self.ckpt_best:
            self.ckpt_best.wait()
        return state

    # -------------------------------------------------- best-PSNR retention --
    def _load_best_psnr(self) -> float:
        return load_best_psnr(self.workdir)

    def _maybe_save_best(self, step: int, state, ev: dict, best_psnr: float) -> float:
        return maybe_save_best(self.ckpt_best, self.workdir, step, state, ev, best_psnr)


def sample_device_tiles(rng, step, images: jnp.ndarray, tile: int, batch: int):
    """Draw a batch of HR tiles from the staged corpus with device PRNG.

    Replaces the host loader's (image, y, x) choice; the downstream
    crop/augment/degrade randomness is the usual in-step pipeline (which
    folds the same ``(rng, step)`` with a different tag).
    """
    n, h, w, _ = images.shape
    key = jax.random.fold_in(jax.random.fold_in(rng, step), 0x7113)
    ki, ky, kx = jax.random.split(key, 3)
    idx = jax.random.randint(ki, (batch,), 0, n)
    ys = jax.random.randint(ky, (batch,), 0, h - tile + 1)
    xs = jax.random.randint(kx, (batch,), 0, w - tile + 1)

    def one(i, y, x):
        return jax.lax.dynamic_slice(images, (i, y, x, 0), (1, tile, tile, 3))[0]

    return jax.vmap(one)(idx, ys, xs)


def stage_device_images(dataset, tile: int, sharding, logger) -> jnp.ndarray:
    """Decode the whole corpus, reflect-pad to max HxW, stage on device."""
    imgs = [dataset.decode(i) for i in range(len(dataset))]
    hm = max(max(im.shape[0] for im in imgs), tile)
    wm = max(max(im.shape[1] for im in imgs), tile)
    padded = [
        np.pad(
            im,
            ((0, hm - im.shape[0]), (0, wm - im.shape[1]), (0, 0)),
            mode="reflect",
        )
        for im in imgs
    ]
    stack = np.stack(padded)
    logger.log("device_data", 0, images=len(imgs), bytes=int(stack.nbytes))
    return jax.device_put(stack, sharding)


def put_batch(batch_sharding, batch: np.ndarray):
    """Host batch -> sharded device array.

    Multi-process: ``batch`` is this process's *local* shard; the global
    array is assembled across hosts (global batch = local x processes).
    Single-process: plain device_put with the data sharding.
    """
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(batch_sharding, batch)
    return jax.device_put(batch, batch_sharding)


def load_best_psnr(workdir: Path | None) -> float:
    """Best eval PSNR recorded so far in <workdir>/best/best.json."""
    if workdir and (Path(workdir) / "best" / "best.json").exists():
        import json

        return json.loads(
            (Path(workdir) / "best" / "best.json").read_text()
        ).get("psnr", float("-inf"))
    return float("-inf")


def maybe_save_best(
    ckpt_best: CheckpointManager | None, workdir, step: int, state, ev: dict,
    best_psnr: float,
) -> float:
    """Save ``state`` under <workdir>/best iff its eval PSNR is a new high."""
    if ckpt_best is None or ev.get("psnr", float("-inf")) <= best_psnr:
        return best_psnr
    import json

    ckpt_best.save(step, jax.device_get(state))
    (Path(workdir) / "best" / "best.json").write_text(json.dumps({"step": step, **ev}))
    return ev["psnr"]
