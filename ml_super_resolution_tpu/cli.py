"""``sr`` command-line interface (L5 of SURVEY §1b).

Replaces the reference's per-paper ``python <experiment>.py --flag=...``
scripts (SURVEY §2a "Config") with one CLI over the model registry:

    sr train   --model espcn --scale 3 --data DIR --workdir runs/espcn3
    sr eval    --workdir runs/espcn3 [--data SET_DIR]
    sr upscale --workdir runs/espcn3 --input in.png --output out.png
    sr bench

Every run directory is self-describing (config.json beside the checkpoints),
so ``eval``/``upscale`` need only ``--workdir``.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from pathlib import Path

import numpy as np


def _add_train_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--model", default="srcnn",
                   choices=["srcnn", "espcn", "vdsr", "srresnet", "srgan",
                            "edsr"])
    p.add_argument("--scale", type=int, default=2, choices=[2, 3, 4, 8])
    p.add_argument("--model-arg", action="append", default=[],
                   metavar="K=V",
                   help="model hyperparameter override, repeatable (e.g. "
                        "--model-arg num_blocks=32 --model-arg features=256 "
                        "--model-arg res_scale=0.1 for full EDSR)")
    p.add_argument("--data", default="", help="HR image dir (synthetic if empty)")
    p.add_argument("--eval-data", default="", help="benchmark set dir")
    p.add_argument("--workdir", default="", help="run dir (ckpts + metrics)")
    p.add_argument("--steps", type=int, default=100_000)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--patch-size", type=int, default=0, help="0 = per-model default")
    p.add_argument("--tile-size", type=int, default=0,
                   help="HR tile edge the host ships per example "
                        "(0 = auto: ~2x patch, capped at 192)")
    p.add_argument("--lr", type=float, default=0.0, help="0 = per-model default")
    p.add_argument("--lr-decay-steps", type=int, default=0,
                   help="staircase LR decay interval in steps (0 = constant LR)")
    p.add_argument("--lr-decay-rate", type=float, default=0.1)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--qat", action="store_true",
                   help="quantization-aware fine-tuning: the training "
                        "forward sees int8 rounding (STE gradients), so "
                        "PTQ of the resulting checkpoint is near-lossless")
    p.add_argument("--pallas-preprocess", action="store_true",
                   help="K3: fused Pallas luma+degrade stage in the train "
                        "step (Y-channel single-scale models)")
    p.add_argument("--steps-per-call", type=int, default=1,
                   help="scan K batches per jitted call (amortizes dispatch "
                        "and host->device latency; identical math to K=1)")
    p.add_argument("--device-data", action="store_true",
                   help="stage the whole decoded corpus on device once and "
                        "sample tiles with the device PRNG — zero "
                        "steady-state host->device traffic (corpus must "
                        "fit in HBM; SR datasets are tiny)")
    p.add_argument("--dp", type=int, default=0, help="data-parallel devices (0=all)")
    p.add_argument("--ema", type=float, default=0.0)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--deterministic", action="store_true",
                   help="bit-reproducible runs: single-thread seeded data "
                        "order (same seed => identical metrics)")
    p.add_argument("--multi-scale", action="store_true",
                   help="VDSR joint x2/x3/x4 training (pre-upscale models)")
    p.add_argument("--pretrain-steps", type=int, default=0, help="srgan MSE phase")
    p.add_argument("--d-lr-scale", type=float, default=1.0,
                   help="srgan: D learning-rate multiplier (e.g. 0.1)")
    p.add_argument("--label-smooth", type=float, default=0.0,
                   help="srgan: one-sided real-label smoothing (e.g. 0.1)")
    p.add_argument("--r1-gamma", type=float, default=0.0,
                   help="srgan: R1 gradient-penalty weight on reals")
    p.add_argument("--d-patch", type=int, default=0,
                   help="srgan: patch-wise D — crop every D input to a "
                        "random NxN sub-patch (harder D task; 0 = off)")
    p.add_argument("--d-augment", action="store_true",
                   help="srgan: differentiable per-sample flips/rot90 on "
                        "all D inputs (DiffAugment-style)")
    p.add_argument("--g-init", default="",
                   help="srgan: init generator from this srresnet run dir "
                        "(skips the MSE pretrain phase)")
    p.add_argument("--vgg-weights", default="", help="VGG19 npz/h5 for srgan")
    p.add_argument("--feature-net", default="",
                   help="srgan: self-trained feature-net ckpt dir for the "
                        "perceptual loss (offline substitute for VGG19)")
    p.add_argument("--coordinator", default="",
                   help="host:port of process 0 for multi-host training "
                        "(jax.distributed; unset = single-process)")
    p.add_argument("--num-processes", type=int, default=0,
                   help="total processes in the multi-host job (0 = infer)")
    p.add_argument("--process-id", type=int, default=-1,
                   help="this process's id (-1 = infer)")
    p.add_argument("--previews", action="store_true",
                   help="save bicubic/SR/HR PNG triplets at each eval "
                        "(+TB image summaries when TB is on)")
    p.add_argument("--eval-every", type=int, default=2000)
    p.add_argument("--ckpt-every", type=int, default=2000)
    p.add_argument("--log-every", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)


# Per-paper training defaults (SURVEY §2a table).
_MODEL_DEFAULTS = {
    "srcnn": dict(patch=33, lr=1e-4, clip=0.0),
    "espcn": dict(patch=51, lr=1e-4, clip=0.0),
    "vdsr": dict(patch=41, lr=1e-3, clip=0.5),  # high LR + clipping, paper §3.3
    "srresnet": dict(patch=96, lr=1e-4, clip=0.0),
    "srgan": dict(patch=96, lr=1e-4, clip=0.0),
    # EDSR protocol (arXiv:1707.02921 §4.2): 48^2 LR patches, L1, Adam 1e-4.
    "edsr": dict(patch=192, lr=1e-4, clip=0.0, loss="l1"),
}


def _parse_model_args(pairs) -> dict:
    """``--model-arg k=v`` values: int, then float, then bool, else str."""
    out = {}
    for pair in pairs:
        k, _, v = pair.partition("=")
        if not _:
            raise SystemExit(f"--model-arg expects K=V, got {pair!r}")
        for cast in (int, float):
            try:
                out[k] = cast(v)
                break
            except ValueError:
                continue
        else:
            out[k] = {"true": True, "false": False}.get(v.lower(), v)
    return out


def _config_from_args(args) -> "ExperimentConfig":
    from ml_super_resolution_tpu.utils.config import (
        DataConfig,
        ExperimentConfig,
        ModelConfig,
        TrainConfig,
    )

    d = _MODEL_DEFAULTS[args.model]
    channels = 3 if args.model in ("srresnet", "srgan", "edsr") else 1
    patch = args.patch_size or d["patch"]
    patch -= patch % args.scale  # keep LR/HR grids aligned
    # Host->device transfer is the training loop's only per-step traffic;
    # ship tiles ~2x the crop edge (4x the pixels) instead of a fixed 192²
    # so small-patch models (SRCNN 33²) don't pay for bytes they never crop.
    tile = getattr(args, "tile_size", 0) or min(192, max(2 * patch, 96))
    return ExperimentConfig(
        model=ModelConfig(name=args.model, scale=args.scale, channels=channels,
                          overrides=_parse_model_args(
                              getattr(args, "model_arg", []))),
        data=DataConfig(
            train_dir=args.data,
            eval_dir=args.eval_data,
            patch_size=patch,
            batch_size=args.batch_size,
            tile_size=max(tile, patch),
            scales=(2, 3, 4) if getattr(args, "multi_scale", False) else (),
            seed=args.seed,
            deterministic=getattr(args, "deterministic", False),
            device_dataset=getattr(args, "device_data", False),
        ),
        train=TrainConfig(
            steps=args.steps,
            learning_rate=args.lr or d["lr"],
            lr_decay_steps=args.lr_decay_steps,
            lr_decay_rate=args.lr_decay_rate,
            grad_clip_norm=d["clip"],
            loss=d.get("loss", "mse"),
            bf16=args.bf16,
            pallas_preprocess=getattr(args, "pallas_preprocess", False),
            qat=getattr(args, "qat", False),
            steps_per_call=getattr(args, "steps_per_call", 1),
            dp=args.dp,
            ema_decay=args.ema,
            resume=not args.no_resume,
            pretrain_steps=args.pretrain_steps,
            d_lr_scale=getattr(args, "d_lr_scale", 1.0),
            label_smooth=getattr(args, "label_smooth", 0.0),
            r1_gamma=getattr(args, "r1_gamma", 0.0),
            d_patch=getattr(args, "d_patch", 0),
            d_augment=getattr(args, "d_augment", False),
            previews=getattr(args, "previews", False),
            eval_every=args.eval_every,
            ckpt_every=args.ckpt_every,
            log_every=args.log_every,
        ),
    )


def cmd_train(args) -> int:
    from ml_super_resolution_tpu.data.datasets import load_eval_images, make_dataset
    from ml_super_resolution_tpu.data.loader import TileLoader
    from ml_super_resolution_tpu.parallel.distributed import maybe_initialize

    # Must run before any jax device/mesh use (no-op when --coordinator unset).
    maybe_initialize(args.coordinator, args.num_processes, args.process_id)
    if getattr(args, "qat", False) and args.model == "srgan":
        print("--qat is not wired into the adversarial (srgan) trainer; "
              "QAT-fine-tune the srresnet generator instead", file=sys.stderr)
        return 2
    if "auto" in (args.data, args.eval_data):
        from ml_super_resolution_tpu.data.discover import resolve_data_arg

        args.data = resolve_data_arg(args.data, "train")
        args.eval_data = resolve_data_arg(args.eval_data, "eval")
        print(json.dumps({"data_autodiscovery": {
            "train": args.data or "(synthetic)",
            "eval": args.eval_data or "(synthetic)",
        }}), file=sys.stderr)
    cfg = _config_from_args(args)
    workdir = args.workdir or f"runs/{args.model}_x{args.scale}"
    ds = make_dataset(cfg.data.train_dir or None, n=800, size=256, seed=cfg.data.seed)
    eval_imgs = load_eval_images(cfg.data.eval_dir or None)
    loader = TileLoader(
        ds,
        batch_size=cfg.data.batch_size,
        tile_size=cfg.data.tile_size,
        patches_per_tile=cfg.data.patches_per_tile,
        num_workers=cfg.data.num_workers,
        seed=cfg.data.seed,
        deterministic=cfg.data.deterministic,
    )
    # --device-data never consumes host batches: don't start decode workers
    # (they would poll the prefetch queue for the whole run on a 1-core host).
    import contextlib

    loader_ctx = (
        contextlib.nullcontext(loader) if cfg.data.device_dataset else loader
    )
    with loader_ctx:
        if args.model == "srgan":
            from ml_super_resolution_tpu.train.gan import GANTrainer

            trainer = GANTrainer(
                cfg, workdir=workdir, vgg_weights=args.vgg_weights or None,
                feature_net=args.feature_net or None,
            )
            state = trainer.fit(loader, eval_images=eval_imgs, seed=args.seed,
                                g_init=args.g_init or None)
            final = trainer.evaluate(state, eval_imgs)
            print(json.dumps({"final_eval": final}))
        else:
            from ml_super_resolution_tpu.train.trainer import Trainer

            trainer = Trainer(cfg, workdir=workdir)
            state = trainer.fit(loader, eval_images=eval_imgs, seed=args.seed)
            final = trainer.evaluate(state, eval_imgs)
            print(json.dumps({"final_eval": final}))
    return 0


def _parse_tiles(spec: str | int) -> tuple[int, int]:
    """``"4"`` -> 4 row bands; ``"2x4"`` -> 2x4 (rows x cols) device grid."""
    s = str(spec).lower()
    if "x" in s:
        r, c = s.split("x", 1)
        return int(r), int(c)
    return int(s), 1


def _load_run(workdir: str, best: bool = False):
    """Rebuild trainer + latest state from a self-describing run dir.

    srgan run dirs checkpoint a ``GANState`` (g/d params + both optimizers);
    eval/upscale/serve only need the generator, so restore with the GAN
    template and re-pack the generator half into a plain ``TrainState``.
    ``best=True`` loads the best-eval-PSNR retention checkpoint
    (<workdir>/best) instead of the latest step.
    """
    from ml_super_resolution_tpu.train.checkpoint import CheckpointManager
    from ml_super_resolution_tpu.train.trainer import Trainer
    from ml_super_resolution_tpu.utils.config import ExperimentConfig

    wd = Path(workdir)
    cfg = ExperimentConfig.load(wd / "ckpts" / "config.json")
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, dp=1))
    trainer = Trainer(cfg, workdir=None)
    trainer.ckpt = None
    ckpt_dir = wd / ("best" if best else "ckpts")
    if best and not ckpt_dir.exists():
        raise SystemExit(f"no best-PSNR checkpoint under {ckpt_dir}")
    mgr = CheckpointManager(ckpt_dir, max_to_keep=1)
    if cfg.model.name == "srgan":
        from ml_super_resolution_tpu.train.gan import GANTrainer

        gan = GANTrainer(cfg, workdir=None)
        restored = mgr.restore_latest(gan.init_state(0))
        if restored is None:
            raise SystemExit(f"no checkpoint under {wd}/ckpts")
        gstate, step = restored
        state = trainer.init_state(0).replace(
            step=gstate.step, params=gstate.g_params, batch_stats=gstate.g_stats
        )
        return trainer, state, step, cfg
    template = trainer.init_state(0)
    restored = mgr.restore_latest(template)
    if restored is None:
        raise SystemExit(f"no checkpoint under {wd}/ckpts")
    state, step = restored
    return trainer, state, step, cfg


def cmd_eval(args) -> int:
    from ml_super_resolution_tpu.data.datasets import load_eval_images

    trainer, state, step, cfg = _load_run(args.workdir, best=getattr(args, "best", False))
    imgs = load_eval_images(args.data or cfg.data.eval_dir or None)
    scales = (
        [int(s) for s in args.scales.split(",")]
        if args.scales
        else [cfg.model.scale]
    )
    result = {"step": step, "n_images": len(imgs)}
    if getattr(args, "ensemble", False):
        result["ensemble"] = True
    if getattr(args, "int8", False):
        result["int8"] = True
    feat_params = None
    if getattr(args, "perceptual", ""):
        from ml_super_resolution_tpu.models.featurenet import load_feature_net

        feat_params = load_feature_net(args.perceptual)
        result["perceptual"] = args.perceptual
    for s in scales:
        out = trainer.evaluate(state, imgs, scale=s,
                               ensemble=getattr(args, "ensemble", False),
                               int8=getattr(args, "int8", False),
                               perceptual=feat_params)
        if len(scales) == 1:
            result.update(out)
        else:
            result[f"x{s}"] = out
    print(json.dumps(result))
    return 0


def cmd_upscale(args) -> int:
    import jax.numpy as jnp
    from PIL import Image

    from ml_super_resolution_tpu.infer import upscale_frames, upscale_image
    from ml_super_resolution_tpu.parallel.mesh import make_mesh

    trainer, state, step, cfg = _load_run(args.workdir, best=getattr(args, "best", False))
    model = trainer.model
    if getattr(args, "bf16", False):
        # bf16 compute trunk (params stay f32; flax casts per-op) — the
        # fastest measured configuration at quality parity, same swap the
        # serve endpoint uses.  Folded-tail routes inherit the dtype.
        import dataclasses as _dc2

        from ml_super_resolution_tpu.models import build_model as _bm

        ov = dict(cfg.model.overrides)
        ov["dtype"] = jnp.bfloat16
        model = _bm(_dc2.replace(cfg.model, overrides=ov))
    variables = {"params": trainer.eval_params(state)}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    rows, cols = _parse_tiles(args.tiles)
    mesh = (
        make_mesh(dp=1, sp=rows, sw=cols) if rows * cols > 1 else None
    )

    in_path, out_path = Path(args.input), Path(args.output)
    if in_path.suffix.lower() == ".y4m":
        return _upscale_y4m(args, model, variables, cfg, mesh, in_path,
                            out_path, step)
    if in_path.is_dir():
        # video-as-frames directory (SURVEY §3.3): batch same-size frames
        from ml_super_resolution_tpu.data.datasets import ImageFolder

        ds = ImageFolder(in_path)
        out_path.mkdir(parents=True, exist_ok=True)
        frames = [ds.decode(i) for i in range(len(ds))]
        names = [p.name for p in ds.paths]
        done = 0
        batch = args.batch
        for i in range(0, len(frames), batch):
            chunk = frames[i : i + batch]
            if len({f.shape for f in chunk}) == 1:
                sr = np.asarray(upscale_frames(
                    model, variables, jnp.asarray(np.stack(chunk)),
                    cfg.model.name, cfg.model.scale, mesh=mesh,
                    use_pallas=args.pallas, ensemble=args.ensemble,
                    int8=args.int8,
                ))
            else:  # mixed sizes: per frame
                sr = [upscale_image(model, variables, f,
                                    cfg.model.name, cfg.model.scale, mesh=mesh,
                                    ensemble=args.ensemble, int8=args.int8)
                      for f in chunk]
            for j, img in enumerate(sr):
                Image.fromarray(np.asarray(img)).save(out_path / names[i + j])
                done += 1
        print(json.dumps({"frames": done, "model": cfg.model.name,
                          "scale": cfg.model.scale, "step": step}))
        return 0

    img = np.asarray(Image.open(in_path).convert("RGB"))
    sr = upscale_image(
        model, variables, img, cfg.model.name, cfg.model.scale, mesh=mesh,
        ensemble=args.ensemble, int8=args.int8,
    )
    Image.fromarray(sr).save(out_path)
    print(json.dumps({
        "input": list(img.shape), "output": list(sr.shape),
        "model": cfg.model.name, "scale": cfg.model.scale, "step": step,
    }))
    return 0


def _upscale_y4m(args, model, variables, cfg, mesh, in_path, out_path,
                 step) -> int:
    """Video-container upscale: Y4M in -> Y4M out.

    The pipeline itself (luma-direct Y-channel models, 4:2:0 preservation,
    C444 for RGB models) lives in ``infer.upscale_y4m_stream`` — shared with
    the HTTP streaming endpoint (``serve.py`` ``POST /upscale_y4m``)."""
    from ml_super_resolution_tpu.data.video import Y4MReader, Y4MWriter
    from ml_super_resolution_tpu.infer import upscale_y4m_stream

    with Y4MReader(in_path) as rd:
        out_meta, done = upscale_y4m_stream(
            rd, lambda m: Y4MWriter(out_path, m), model, variables,
            cfg.model.name, cfg.model.scale, mesh=mesh, batch=args.batch,
            use_pallas=args.pallas, ensemble=args.ensemble, int8=args.int8)
    print(json.dumps({
        "frames": done, "model": cfg.model.name, "scale": cfg.model.scale,
        "step": step, "colorspace": out_meta.colorspace,
        "output_size": [out_meta.width, out_meta.height],
    }))
    return 0


def cmd_export(args) -> int:
    """Package a run's inference pipeline as an AOT SRX1 artifact (aot.py)."""
    import jax.numpy as jnp

    from ml_super_resolution_tpu.aot import export_artifact
    from ml_super_resolution_tpu.ops.resize import imresize

    trainer, state, step, cfg = _load_run(args.workdir, best=args.best)
    model = trainer.model
    if args.bf16:
        from ml_super_resolution_tpu.models import build_model

        ov = dict(cfg.model.overrides)
        ov["dtype"] = jnp.bfloat16
        model = build_model(dataclasses.replace(cfg.model, overrides=ov))
    variables = {"params": trainer.eval_params(state)}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    h, w = (int(v) for v in args.size.lower().split("x"))
    calib = None
    if args.int8:
        if args.calib:
            from PIL import Image

            img = np.asarray(Image.open(args.calib).convert("RGB"))
        else:  # synthetic fallback: representative enough for max-abs PTQ
            from ml_super_resolution_tpu.data.datasets import SyntheticImages

            img = SyntheticImages(n=1, size=max(h, w, 64), seed=7).decode(0)
        x = jnp.asarray(img, jnp.float32)[None] / 255.0
        calib = np.asarray(jnp.round(jnp.clip(
            imresize(x, out_shape=(h, w)), 0.0, 1.0) * 255.0).astype(jnp.uint8))
    batches = ("any" if args.batches.strip().lower() == "any"
               else [int(b) for b in args.batches.split(",")])
    header = export_artifact(
        model, variables, cfg.model.name, cfg.model.scale, h, w,
        args.output, batches=batches, int8=args.int8, calib_u8=calib,
        step=step)
    print(json.dumps({"artifact": args.output, **header}))
    return 0


def cmd_serve(args) -> int:
    from ml_super_resolution_tpu.serve import serve

    if getattr(args, "from_export", ""):
        print(json.dumps({
            "serving": f"http://{args.host}:{args.port}",
            "artifact": args.from_export,
        }), flush=True)
        serve(None, None, None, host=args.host, port=args.port,
              max_batch=args.max_batch, window_ms=args.window_ms,
              artifact=args.from_export)
        return 0

    if not args.workdir:
        print("serve needs --workdir or --from-export", file=sys.stderr)
        return 2
    trainer, state, step, cfg = _load_run(args.workdir, best=getattr(args, "best", False))
    extra = {}
    for spec in args.extra or []:
        name, _, wd = spec.partition("=")
        if not wd:
            print(f"--extra expects name=workdir, got {spec!r}", file=sys.stderr)
            return 2
        tr_i, st_i, _, cfg_i = _load_run(wd, best=getattr(args, "best", False))
        extra[name] = (tr_i, st_i, cfg_i)
    print(json.dumps({
        "serving": f"http://{args.host}:{args.port}", "model": cfg.model.name,
        "scale": cfg.model.scale, "step": step, "bf16": args.bf16,
        "extra_models": sorted(extra),
    }), flush=True)
    serve(trainer, state, cfg, host=args.host, port=args.port,
          use_pallas=args.pallas, max_batch=args.max_batch,
          window_ms=args.window_ms, bf16=args.bf16, extra_models=extra,
          int8=args.int8)
    return 0


def cmd_featurenet(args) -> int:
    """Train the self-supervised perceptual backbone (models/featurenet.py)."""
    from ml_super_resolution_tpu.data.datasets import make_dataset
    from ml_super_resolution_tpu.data.loader import TileLoader
    from ml_super_resolution_tpu.models.featurenet import (
        fit_feature_net,
        save_feature_net,
    )

    ds = make_dataset(args.data or None, n=800, size=256, seed=args.seed)
    loader = TileLoader(ds, batch_size=args.batch_size, tile_size=192,
                        seed=args.seed)
    with loader:
        params = fit_feature_net(loader, steps=args.steps, seed=args.seed)
    out = save_feature_net(params, args.workdir)
    print(json.dumps({"featurenet": str(out), "steps": args.steps}))
    return 0


def cmd_parity(args) -> int:
    """Paper-protocol parity table vs BASELINE.md (see parity.py)."""
    from ml_super_resolution_tpu.parity import main_parity

    if args.data == "auto":
        # zero-interaction path for a surprise data mount (data/discover.py)
        from ml_super_resolution_tpu.data.discover import discover_datasets

        found = discover_datasets()
        sets = {k: v for k, v in found.items()
                if k in ("set5", "set14", "bsd100", "b100")}
        if not sets:
            print(json.dumps({"parity": "no benchmark sets discovered",
                              "found": found}))
            return 3
        args.data = str(Path(next(iter(sets.values()))).parent)
        print(json.dumps({"discovered": sets, "using": args.data}),
              file=sys.stderr)
    return main_parity(args)


def cmd_bench(args) -> int:
    import bench  # repo-root harness

    bench.main()
    return 0


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache (SR_JAX_CACHE=dir; '0' disables).

    Amortizes compiles across process restarts — chunked/resumed training
    runs (the relay-leak workaround) otherwise pay a full recompile per
    chunk.  Harmless no-op where the backend compiles server-side.
    """
    import os

    cache = os.environ.get("SR_JAX_CACHE", "/root/.cache/sr_jax_cache")
    if cache == "0":
        return
    try:
        import jax

        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass  # cache is an optimization, never a requirement


def main(argv=None) -> int:
    _enable_compilation_cache()
    parser = argparse.ArgumentParser(prog="sr", description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_train = sub.add_parser("train", help="train a model")
    _add_train_args(p_train)
    p_train.set_defaults(fn=cmd_train)

    p_eval = sub.add_parser("eval", help="evaluate a run on a benchmark set")
    p_eval.add_argument("--workdir", required=True)
    p_eval.add_argument("--best", action="store_true",
                        help="load the best-eval-PSNR checkpoint, not latest")
    p_eval.add_argument("--data", default="", help="benchmark dir (Set5 layout)")
    p_eval.add_argument("--ensemble", action="store_true",
                        help="D4 geometric self-ensemble (EDSR+): mean of the "
                             "8 dihedral predictions, 8x inference cost")
    p_eval.add_argument("--scales", default="",
                        help="comma list, e.g. 2,3,4 (multi-scale models)")
    p_eval.add_argument("--int8", action="store_true",
                        help="PTQ int8 forward (quant.py): reports the "
                             "quantized PSNR/SSIM for this checkpoint")
    p_eval.add_argument("--perceptual", default="", metavar="FEATURENET",
                        help="FeatureNet dir/npz (sr featurenet): adds "
                             "'featnet' = mean feature-space MSE vs HR, the "
                             "metric counterpart of the SRGAN perceptual "
                             "loss (lower is better)")
    p_eval.set_defaults(fn=cmd_eval)

    p_up = sub.add_parser("upscale", help="upscale an image with a trained run")
    p_up.add_argument("--workdir", required=True)
    p_up.add_argument("--best", action="store_true")
    p_up.add_argument("--input", required=True)
    p_up.add_argument("--output", required=True)
    p_up.add_argument("--tiles", default="1",
                      help="spatial shards for tiled inference: N row bands "
                           "or RxC grid (e.g. --tiles 4 or --tiles 2x4)")
    p_up.add_argument("--batch", type=int, default=8,
                      help="frames per device batch for directory input")
    p_up.add_argument("--ensemble", action="store_true",
                      help="D4 geometric self-ensemble (EDSR+), 8x cost")
    p_up.add_argument("--pallas", action="store_true",
                      help="fused Pallas inference kernel (ESPCN)")
    p_up.add_argument("--bf16", action="store_true",
                      help="bfloat16 compute trunk (params stay f32) — "
                           "fastest measured config at quality parity")
    p_up.add_argument("--int8", action="store_true",
                      help="PTQ int8 conv stack (quant.py), self-calibrated "
                           "on the first frame — the int8-MXU serving path")
    p_up.set_defaults(fn=cmd_upscale)

    p_serve = sub.add_parser("serve", help="HTTP upscaling endpoint")
    p_serve.add_argument("--workdir", default="",
                         help="run dir (omit with --from-export)")
    p_serve.add_argument("--from-export", default="", dest="from_export",
                         help="serve an AOT SRX1 artifact (sr export) — no "
                              "checkpoint or model code needed")
    p_serve.add_argument("--best", action="store_true")
    p_serve.add_argument("--host", default="127.0.0.1")
    p_serve.add_argument("--port", type=int, default=8600)
    p_serve.add_argument("--pallas", action="store_true")
    p_serve.add_argument("--bf16", action="store_true",
                         help="bfloat16 serving trunk (f32 params)")
    p_serve.add_argument("--int8", action="store_true",
                         help="PTQ int8 serving trunk (quant.py), "
                              "calibrated on the first request batch")
    p_serve.add_argument("--extra", action="append", default=[],
                         metavar="NAME=WORKDIR",
                         help="additional models: POST /upscale?model=NAME")
    p_serve.add_argument("--max-batch", type=int, default=8,
                         help="micro-batch cap for coalesced requests")
    p_serve.add_argument("--window-ms", type=float, default=4.0,
                         help="micro-batch collection window")
    p_serve.set_defaults(fn=cmd_serve)

    p_exp = sub.add_parser(
        "export", help="package a run as an AOT serving artifact (SRX1)")
    p_exp.add_argument("--workdir", required=True)
    p_exp.add_argument("--best", action="store_true")
    p_exp.add_argument("--output", required=True, help="artifact file (.srx)")
    p_exp.add_argument("--size", default="270x480",
                       help="LR frame geometry HxW (default: 1080p at x4)")
    p_exp.add_argument("--batches", default="1,2,4,8",
                       help="micro-batch buckets to export programs for, or "
                            "'any' for ONE shape-polymorphic program "
                            "(symbolic batch dim; specializes per shape on "
                            "the target)")
    p_exp.add_argument("--bf16", action="store_true",
                       help="bfloat16 compute trunk")
    p_exp.add_argument("--int8", action="store_true",
                       help="PTQ int8 conv stack (quant.py)")
    p_exp.add_argument("--calib", default="",
                       help="calibration image for --int8 (PNG/JPEG; "
                            "synthetic fallback if omitted)")
    p_exp.set_defaults(fn=cmd_export)

    p_feat = sub.add_parser(
        "featurenet", help="train the offline perceptual-loss backbone"
    )
    p_feat.add_argument("--workdir", required=True)
    p_feat.add_argument("--data", default="", help="HR dir (synthetic if empty)")
    p_feat.add_argument("--steps", type=int, default=3000)
    p_feat.add_argument("--batch-size", type=int, default=32)
    p_feat.add_argument("--seed", type=int, default=0)
    p_feat.set_defaults(fn=cmd_featurenet)

    p_par = sub.add_parser(
        "parity",
        help="paper-protocol PSNR parity table on benchmark sets "
             "(the BASELINE.md comparison, one command)",
    )
    p_par.add_argument("--data", required=True,
                       help="dir of benchmark set folders (Set5/Set14/BSD100) "
                            "or one set folder")
    p_par.add_argument("--workdirs", default="",
                       help="comma list of trained run dirs to score")
    p_par.add_argument("--sets", default="", help="subset, e.g. Set5,Set14")
    p_par.add_argument("--int8", action="store_true",
                       help="PTQ int8 rows: quantized PSNR deltas vs paper")
    p_par.add_argument("--ensemble", action="store_true",
                       help="D4 self-ensemble rows (EDSR+ protocol)")
    p_par.add_argument("--best", action="store_true",
                       help="use each run's best-PSNR checkpoint")
    p_par.add_argument("--out", default="", help="also write markdown here")
    p_par.set_defaults(fn=cmd_parity)

    p_bench = sub.add_parser("bench", help="run the benchmark harness")
    p_bench.set_defaults(fn=cmd_bench)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
