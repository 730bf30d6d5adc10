"""SRGAN adversarial trainer (arXiv:1609.04802; BASELINE.json:10).

Two-phase protocol per the paper: the generator (SRResNet) is first
pretrained with MSE (use the plain ``Trainer`` — ``pretrain_steps``), then
trained adversarially: each step updates the discriminator on real/fake HR
patches and the generator on
``perceptual_weight * VGG54-MSE + pixel MSE + adversarial_weight * BCE``.

TPU shape: the entire alternating step — pair synthesis, G forward, D on
real and fake halves (separate BN passes so batch statistics never mix),
both optimizer updates — is ONE jitted XLA program with donated state,
batch sharded over the ``data`` axis like the plain trainer.  GAN-stability details per
SURVEY §7: discriminator logits and VGG features stay f32 even when the
trunks run bf16.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ml_super_resolution_tpu.models import build_model
from ml_super_resolution_tpu.models.srresnet import SRGANDiscriminator
from ml_super_resolution_tpu.models.vgg import VGG19Features, load_vgg19_params
from ml_super_resolution_tpu.ops.patches import training_pairs
from ml_super_resolution_tpu.train.checkpoint import CheckpointManager
from ml_super_resolution_tpu.train.trainer import (
    Trainer,
    load_best_psnr,
    make_optimizer,
    maybe_save_best,
    put_batch,
    sample_device_tiles,
    stage_device_images,
)
from ml_super_resolution_tpu.utils.config import ExperimentConfig
from ml_super_resolution_tpu.utils.logging import MetricsLogger


class GANState(struct.PyTreeNode):
    step: jnp.ndarray
    g_params: Any
    g_stats: Any
    g_opt: Any
    d_params: Any
    d_stats: Any
    d_opt: Any
    rng: jax.Array


def _bce_logits(logits: jnp.ndarray, target: float) -> jnp.ndarray:
    """Mean binary cross-entropy with logits against a constant target."""
    t = jnp.full_like(logits, target)
    return jnp.mean(
        optax.sigmoid_binary_cross_entropy(logits.astype(jnp.float32), t)
    )


class GANTrainer:
    """Adversarial phase; generator architecture/config = 'srgan' registry."""

    def __init__(
        self,
        cfg: ExperimentConfig,
        workdir: str | Path | None = None,
        vgg_weights: str | None = None,
        feature_net: str | Path | None = None,
    ):
        assert cfg.model.name in ("srgan", "srresnet")
        self.cfg = cfg
        overrides = dict(cfg.model.overrides)
        if cfg.train.bf16:
            overrides.setdefault("dtype", jnp.bfloat16)
        self.generator = build_model(
            cfg.model.__class__(
                name=cfg.model.name, scale=cfg.model.scale,
                channels=cfg.model.channels, overrides=overrides,
            )
        )
        self.discriminator = SRGANDiscriminator(
            dtype=jnp.bfloat16 if cfg.train.bf16 else jnp.float32
        )
        # Perceptual backbone (frozen; f32 always for stability): VGG54 when
        # weights are supplied, else an optional self-trained FeatureNet
        # (models/featurenet.py — the honest offline substitute).
        self.vgg = VGG19Features(stop_block=5, stop_conv=4)
        self._vgg_weights_path = vgg_weights
        self.feature_net = None
        self.feature_params = None
        if feature_net:
            from ml_super_resolution_tpu.models.featurenet import (
                FeatureNet,
                load_feature_net,
            )

            self.feature_net = FeatureNet()
            self.feature_params = load_feature_net(feature_net)

        import dataclasses

        self.g_tx = make_optimizer(cfg.train)
        # D gets its own (usually lower) learning rate: the SRGAN-D easily
        # overpowers G on this data — see TrainConfig.d_lr_scale.
        self.d_tx = make_optimizer(dataclasses.replace(
            cfg.train,
            learning_rate=cfg.train.learning_rate * cfg.train.d_lr_scale,
        ))

        if jax.process_count() > 1:
            from ml_super_resolution_tpu.parallel.distributed import (
                make_multihost_mesh,
            )

            self.mesh = make_multihost_mesh()
            self.batch_sharding = NamedSharding(self.mesh, P(("dcn", "data")))
        else:
            dp = cfg.train.dp or len(jax.devices())
            while cfg.data.batch_size % dp:  # see Trainer: dp must divide batch
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
            # Best-PSNR retention, same contract as Trainer (<workdir>/best).
            # For GANs "best PSNR" is a fidelity anchor, not the whole story
            # — the perceptual tradeoff is judged from the eval curves.
            self.ckpt_best = CheckpointManager(self.workdir / "best", max_to_keep=1)

        self.vgg_params = None  # set in init_state
        self.vgg_pretrained = False

        self._gan_step = jax.jit(
            self._step_impl,
            donate_argnums=(0,),
            in_shardings=(self.replicated, self.batch_sharding),
            out_shardings=(self.replicated, self.replicated),
        )
        # Multi-step dispatch (TrainConfig.steps_per_call), same contract as
        # Trainer: scan K stacked batches per call, last step's metrics.
        stack_spec = (
            P(None, ("dcn", "data")) if jax.process_count() > 1 else P(None, "data")
        )
        self.stack_sharding = NamedSharding(self.mesh, stack_spec)
        self._gan_step_scan = jax.jit(
            lambda state, stack: (
                lambda sm: (sm[0], jax.tree.map(lambda m: m[-1], sm[1]))
            )(jax.lax.scan(lambda s, t: self._step_impl(s, t), state, stack)),
            donate_argnums=(0,),
            in_shardings=(self.replicated, self.stack_sharding),
            out_shardings=(self.replicated, self.replicated),
        )
        # Device-resident dataset (DataConfig.device_dataset): sample tiles
        # with the device PRNG from the staged corpus — zero steady-state
        # host->device traffic (same design as Trainer).
        self._gan_device_step = jax.jit(
            self._device_step_impl,
            donate_argnums=(0,),
            in_shardings=(self.replicated, self.replicated),
            out_shardings=(self.replicated, self.replicated),
        )
        self._gan_device_multi = jax.jit(
            self._device_multi_impl,
            static_argnums=(2,),
            donate_argnums=(0,),
            in_shardings=(self.replicated, self.replicated),
            out_shardings=(self.replicated, self.replicated),
        )
        # per-shape compile cache for eval (one trace per eval-image shape)
        self._g_eval = jax.jit(
            lambda p, s, x: self._g_apply(p, s, x, False)[0]
        )

    # ------------------------------------------------------------- state --
    def init_state(self, seed: int = 0, g_params=None, g_stats=None) -> GANState:
        """Fresh state; pass ``g_params`` to start from an MSE-pretrained
        generator (the paper's protocol)."""
        c = self.cfg
        patch = c.data.patch_size
        lr_patch = patch // c.model.scale
        g_dummy = jnp.zeros((1, lr_patch, lr_patch, c.model.channels), jnp.float32)
        # Patch-wise D (TrainConfig.d_patch): D's dense head is shaped by its
        # init input, so initialize at the VIEWED size; the perceptual
        # backbone still sees full patches (f_dummy).
        d_size = min(c.train.d_patch, patch) if c.train.d_patch else patch
        d_dummy = jnp.zeros((1, d_size, d_size, c.model.channels), jnp.float32)
        f_dummy = jnp.zeros((1, patch, patch, c.model.channels), jnp.float32)
        kg, kd, kv = jax.random.split(jax.random.key(seed), 3)
        g_vars = self.generator.init(kg, g_dummy, train=False)
        d_vars = self.discriminator.init(kd, d_dummy, train=False)
        if self.feature_net is not None:
            self.feature_params = jax.device_put(
                self.feature_params, self.replicated
            )
            self.logger.log("percep", 0, backbone="featurenet (self-trained)")
        else:
            vgg_vars = self.vgg.init(kv, f_dummy)
            self.vgg_params, self.vgg_pretrained = load_vgg19_params(
                self._vgg_weights_path, vgg_vars["params"]
            )
            if not self.vgg_pretrained:
                self.logger.log(
                    "warn", 0,
                    vgg="random-init (no weights file; see models/vgg.py)",
                )
        state = GANState(
            step=jnp.zeros((), jnp.int32),
            g_params=g_params if g_params is not None else g_vars["params"],
            g_stats=g_stats if g_stats is not None else g_vars.get("batch_stats", {}),
            g_opt=None,
            d_params=d_vars["params"],
            d_stats=d_vars.get("batch_stats", {}),
            d_opt=self.d_tx.init(d_vars["params"]),
            rng=jax.random.PRNGKey(seed),
        )
        state = state.replace(g_opt=self.g_tx.init(state.g_params))
        if self.vgg_params is not None:
            self.vgg_params = jax.device_put(self.vgg_params, self.replicated)
        return jax.device_put(state, self.replicated)

    # -------------------------------------------------------------- step --
    def _features(self, x):
        """Frozen perceptual features (f32): FeatureNet if supplied, else VGG54."""
        if self.feature_net is not None:
            return self.feature_net.apply(
                {"params": self.feature_params}, x.astype(jnp.float32)
            )
        return self.vgg.apply({"params": self.vgg_params}, x)

    @property
    def _percep_scale(self) -> float:
        # VGG54 features live in caffe [0,255]-input units; the paper's
        # 1/12.75^2 weight is calibrated for that.  FeatureNet features are
        # in [0,1]-image units, so fold the 255/20 = 12.75 rescale back in
        # to keep c.train.perceptual_weight meaning the same thing.
        return 12.75**2 if self.feature_net is not None else 1.0

    def _g_apply(self, params, stats, x, train):
        variables = {"params": params}
        if stats:
            variables["batch_stats"] = stats
            out, mut = self.generator.apply(
                variables, x, train=train, mutable=["batch_stats"]
            )
            return out, mut["batch_stats"]
        return self.generator.apply(variables, x, train=train), stats

    def _d_apply(self, params, stats, x, train):
        variables = {"params": params}
        if stats:
            variables["batch_stats"] = stats
            out, mut = self.discriminator.apply(
                variables, x, train=train, mutable=["batch_stats"]
            )
            return out, mut["batch_stats"]
        return self.discriminator.apply(variables, x, train=train), stats

    def _d_view(self, key: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
        """Random differentiable view of a D input batch (TrainConfig
        d_patch / d_augment): per-sample crop to ``d_patch``² plus
        per-sample flips/rot90.  Applied to reals and fakes alike; every
        op is differentiable so the adversarial gradient still reaches G
        through the view."""
        c = self.cfg.train
        n = x.shape[0]
        if c.d_patch and c.d_patch < min(x.shape[1], x.shape[2]):
            kc1, kc2, key = jax.random.split(key, 3)
            ys = jax.random.randint(kc1, (n,), 0, x.shape[1] - c.d_patch + 1)
            xs = jax.random.randint(kc2, (n,), 0, x.shape[2] - c.d_patch + 1)
            x = jax.vmap(
                lambda img, yy, xx: jax.lax.dynamic_slice(
                    img, (yy, xx, 0), (c.d_patch, c.d_patch, img.shape[-1])
                )
            )(x, ys, xs)
        if c.d_augment:
            kf1, kf2, kr = jax.random.split(key, 3)
            fl = jax.random.bernoulli(kf1, shape=(n,))[:, None, None, None]
            fv = jax.random.bernoulli(kf2, shape=(n,))[:, None, None, None]
            x = jnp.where(fl, x[:, :, ::-1], x)
            x = jnp.where(fv, x[:, ::-1], x)
            if x.shape[1] == x.shape[2]:  # rot90 needs square inputs
                kq = jax.random.fold_in(kr, 1)
                rot = jax.random.bernoulli(kq, shape=(n,))[:, None, None, None]
                x = jnp.where(rot, jnp.rot90(x, axes=(1, 2)), x)
        return x

    def _step_impl(self, state: GANState, tiles: jnp.ndarray):
        c = self.cfg
        key = jax.random.fold_in(state.rng, state.step)
        lr_b, hr_b = training_pairs(
            key, tiles,
            patch_size=c.data.patch_size, scale=c.model.scale,
            y_only=False, lr_space=True, augment=c.data.augment,
        )
        # D-view keys live on their own stream (fold_in 0x0D) so enabling
        # d_patch/d_augment never perturbs the pair-synthesis RNG above —
        # ablations stay data-identical.
        kd_real, kd_fake, kd_gen = jax.random.split(
            jax.random.fold_in(key, 0x0D), 3
        )

        # ---- discriminator update (G frozen) -----------------------------
        fake, _ = self._g_apply(state.g_params, state.g_stats, lr_b, train=False)
        fake = jax.lax.stop_gradient(fake)
        hr_v = self._d_view(kd_real, hr_b)
        fake_v = self._d_view(kd_fake, fake)

        def d_loss_fn(d_params, d_stats):
            # Two separate passes (real, then fake) threading batch_stats:
            # normalizing the halves together would let D discriminate via
            # batch statistics and skew the running stats (SRGAN recipe).
            real_logits, mid_stats = self._d_apply(d_params, d_stats, hr_v, train=True)
            fake_logits, new_stats = self._d_apply(d_params, mid_stats, fake_v, train=True)
            # one-sided label smoothing: real target 1-eps keeps D's logits
            # bounded so its gradient signal to G never vanishes
            loss = (
                _bce_logits(real_logits, 1.0 - c.train.label_smooth)
                + _bce_logits(fake_logits, 0.0)
            )
            if c.train.r1_gamma > 0.0:
                # R1 gradient penalty on reals (Mescheder et al. 2018):
                # gamma/2 * E||dD/dx||^2, computed with running BN stats
                def _sum_real(x):
                    lg, _ = self._d_apply(d_params, d_stats, x, train=False)
                    return jnp.sum(lg.astype(jnp.float32))

                gr = jax.grad(_sum_real)(hr_v).astype(jnp.float32)
                r1 = jnp.mean(
                    jnp.sum(jnp.square(gr.reshape(gr.shape[0], -1)), axis=1)
                )
                loss = loss + 0.5 * c.train.r1_gamma * r1
            return loss, (new_stats, real_logits, fake_logits)

        (d_loss, (d_stats, real_lg, fake_lg)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(state.d_params, state.d_stats)
        d_updates, d_opt = self.d_tx.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        # ---- generator update (new D frozen) -----------------------------
        feat_hr = self._features(hr_b)

        def g_loss_fn(g_params, g_stats):
            sr, new_stats = self._g_apply(g_params, g_stats, lr_b, train=True)
            pixel = jnp.mean(jnp.square(sr - hr_b))
            feat_sr = self._features(sr)
            percep = self._percep_scale * jnp.mean(jnp.square(feat_sr - feat_hr))
            logits, _ = self._d_apply(
                d_params, d_stats, self._d_view(kd_gen, sr), train=False
            )
            adv = _bce_logits(logits, 1.0)
            loss = (
                pixel
                + c.train.perceptual_weight * percep
                + c.train.adversarial_weight * adv
            )
            return loss, (new_stats, pixel, percep, adv)

        (g_loss, (g_stats, pixel, percep, adv)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.g_params, state.g_stats)
        g_updates, g_opt = self.g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        metrics = {
            "d_loss": d_loss,
            "g_loss": g_loss,
            "pixel": pixel,
            "perceptual": percep,
            "adversarial": adv,
            "d_real_acc": jnp.mean((real_lg > 0).astype(jnp.float32)),
            "d_fake_acc": jnp.mean((fake_lg < 0).astype(jnp.float32)),
        }
        return (
            state.replace(
                step=state.step + 1,
                g_params=g_params, g_stats=g_stats, g_opt=g_opt,
                d_params=d_params, d_stats=d_stats, d_opt=d_opt,
            ),
            metrics,
        )

    def train_step(self, state: GANState, tiles: np.ndarray):
        return self._gan_step(state, put_batch(self.batch_sharding, tiles))

    # ------------------------------------------- device-resident dataset --
    def _device_step_impl(self, state: GANState, images: jnp.ndarray):
        tiles = sample_device_tiles(
            state.rng, state.step, images,
            self.cfg.data.tile_size, self.cfg.data.batch_size,
        )
        return self._step_impl(state, tiles)

    def _device_multi_impl(self, state: GANState, images: jnp.ndarray, k: int):
        state, metrics = jax.lax.scan(
            lambda s, _: self._device_step_impl(s, images), state, None, length=k
        )
        return state, jax.tree.map(lambda m: m[-1], metrics)

    # -------------------------------------------------------------- eval --
    def evaluate(self, state: GANState, images) -> dict[str, float]:
        """Generator-only protocol eval (luma PSNR/SSIM, border shave)."""
        from ml_super_resolution_tpu.ops.color import rgb_to_y
        from ml_super_resolution_tpu.ops.metrics import psnr, ssim
        from ml_super_resolution_tpu.ops.patches import eval_pair

        c = self.cfg
        psnrs, ssims = [], []
        for img in images:
            lr_img, hr_img = eval_pair(
                jnp.asarray(img), c.model.scale, y_only=False, lr_space=True
            )
            sr = self._g_eval(state.g_params, state.g_stats, lr_img[None])
            sr = jnp.clip(sr[0], 0.0, 1.0)
            psnrs.append(psnr(rgb_to_y(sr), rgb_to_y(hr_img), border=c.model.scale))
            ssims.append(ssim(rgb_to_y(sr), rgb_to_y(hr_img), border=c.model.scale))
        return {
            "psnr": float(np.mean([np.asarray(p) for p in psnrs])),
            "ssim": float(np.mean([np.asarray(s) for s in ssims])),
        }

    # --------------------------------------------------------------- fit --
    def pretrain(self, loader: Iterable[np.ndarray], steps: int, seed: int = 0):
        """Phase 1: MSE-only SRResNet pretrain via the shared Trainer.

        Checkpoints under ``<workdir>/pretrain`` (the MSE phase is the long
        one in the paper's ~1e5-step protocol — a preemption must not lose
        it) and auto-resumes from there.
        """
        import dataclasses

        mse_cfg = self.cfg.replace(
            train=dataclasses.replace(self.cfg.train, steps=steps)
        )
        pre_dir = self.workdir / "pretrain" if self.workdir else None
        tr = Trainer(mse_cfg, workdir=pre_dir)
        st = tr.fit(loader, steps=steps, seed=seed)
        return st.params, st.batch_stats

    def load_generator_init(self, g_init_dir: str | Path):
        """Generator params/stats from an existing srresnet run directory."""
        import dataclasses

        wd = Path(g_init_dir)
        cfg = ExperimentConfig.load(wd / self.cfg.train.ckpt_dir / "config.json")
        cfg = cfg.replace(train=dataclasses.replace(cfg.train, dp=1))
        tr = Trainer(cfg, workdir=None)
        mgr = CheckpointManager(wd / cfg.train.ckpt_dir, cfg.train.max_to_keep)
        restored = mgr.restore_latest(tr.init_state(0))
        if restored is None:
            raise FileNotFoundError(f"no checkpoint under {wd}")
        st, step = restored
        self.logger.log("g_init", step, source=str(wd))
        return tr.eval_params(st), st.batch_stats

    def fit(
        self,
        loader: Iterable[np.ndarray],
        steps: int | None = None,
        seed: int = 0,
        eval_images: Sequence[np.ndarray] | None = None,
        g_init: str | Path | None = None,
    ) -> GANState:
        c = self.cfg
        steps = steps or c.train.steps
        g_params = g_stats = None
        # An adversarial-phase checkpoint supersedes pretraining: skip the
        # (expensive) MSE phase entirely when fit will restore anyway.
        will_resume = bool(
            self.ckpt and c.train.resume and self.ckpt.latest_step() is not None
        )
        if not will_resume:
            if g_init:
                g_params, g_stats = self.load_generator_init(g_init)
            elif c.train.pretrain_steps > 0:
                self.logger.log("pretrain", 0, steps=c.train.pretrain_steps)
                g_params, g_stats = self.pretrain(
                    loader, c.train.pretrain_steps, seed
                )
        state = self.init_state(seed, g_params, g_stats)
        start = 0
        if will_resume:
            restored = self.ckpt.restore_latest(state)
            if restored is not None:
                state, start = restored
                self.logger.log("resume", start)
        it = iter(loader)
        best_psnr = load_best_psnr(self.workdir)
        kk = max(1, c.train.steps_per_call)
        todo = steps - start
        schedule = [kk] * (todo // kk) + [1] * (todo % kk)

        def crossed(new_step, old_step, every):
            # every <= 0 disables the periodic action entirely
            return every > 0 and new_step // every > old_step // every

        images = None
        if c.data.device_dataset:
            images = stage_device_images(
                loader.dataset, c.data.tile_size, self.replicated, self.logger
            )
        t0 = time.perf_counter()
        step = start
        since_log = 0
        for k in schedule:
            if images is not None:
                if k == 1:
                    state, metrics = self._gan_device_step(state, images)
                else:
                    state, metrics = self._gan_device_multi(state, images, k)
            elif k == 1:
                state, metrics = self.train_step(state, next(it))
            else:
                stack = np.stack([next(it) for _ in range(k)])
                state, metrics = self._gan_step_scan(
                    state, put_batch(self.stack_sharding, stack)
                )
            prev, step = step, step + k
            since_log += k
            if crossed(step, prev, c.train.log_every) or prev == start == 0:
                m = {key: float(v) for key, v in metrics.items()}
                dt = time.perf_counter() - t0
                t0 = time.perf_counter()
                self.logger.log("gan", step, **m, steps_per_s=since_log / dt)
                since_log = 0
            if eval_images and crossed(step, prev, c.train.eval_every):
                ev = self.evaluate(state, eval_images)
                self.logger.log("eval", step, **ev)
                best_psnr = maybe_save_best(
                    self.ckpt_best, self.workdir, step, state, ev, best_psnr
                )
            if self.ckpt and crossed(step, prev, c.train.ckpt_every):
                self.ckpt.save(step, jax.device_get(state))
        if self.ckpt:
            self.ckpt.save(steps, jax.device_get(state))
            self.ckpt.wait()
        if self.ckpt_best:
            self.ckpt_best.wait()
        return state
