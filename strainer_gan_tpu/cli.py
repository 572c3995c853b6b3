"""CLI entry point: run any preset (or a config JSON) end-to-end.

The reference's "CLI" was ``python <script>.py`` per experiment; here one
binary covers the whole family:

    python -m strainer_gan_tpu.cli --preset final --epochs 2
    python -m strainer_gan_tpu.cli --config my_experiment.json --out runs/x
    python -m strainer_gan_tpu.cli --list
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time


def force_eval_suite(cfg, n_samples: int):
    """``--eval`` against a preset whose EvalConfig is all-off (e.g. ``final``
    mirrors ``# final.py``'s live section, which has no eval tail): the user
    explicitly asked for the suite, so enable the full metric set rather than
    silently returning ``{}``.  Presets that already enable any metric are
    left untouched (their reference scripts define which metrics run)."""
    ev = cfg.eval
    if ev.fid or ev.feature_distance or ev.wasserstein:
        return cfg
    # replace() rather than a fresh EvalConfig: the preset's non-metric knobs
    # (fid_every_epochs, fid_normalize_activations — e.g. the reference's
    # L2-normalized-FID quirk, `# 1,2,8.py:204`) must survive a forced --eval.
    return cfg.replace(eval=dataclasses.replace(
        ev, fid=True, feature_distance=True, wasserstein=True,
        fid_n_samples=n_samples,
    ))


def main(argv=None):
    ap = argparse.ArgumentParser(description="strainer_gan_tpu runner")
    ap.add_argument("--preset", default="basic")
    ap.add_argument("--config", help="path to a config JSON (overrides --preset)")
    ap.add_argument("--list", action="store_true", help="list presets and exit")
    ap.add_argument("--epochs", type=int, help="override epoch count")
    ap.add_argument("--batch-size", type=int)
    ap.add_argument("--max-synth", type=int, default=None,
                    help="cap synthetic dataset size (smoke runs)")
    ap.add_argument("--out", default=None, help="output dir (samples, ckpts, metrics)")
    ap.add_argument("--checkpoint-every", type=int, default=0)
    ap.add_argument("--save-samples-every", type=int, default=0,
                    help="save a sample grid PNG every N epochs "
                         "(the reference's GAN_results/ PNGs)")
    ap.add_argument("--resume", default=None, help="checkpoint dir to resume from")
    ap.add_argument("--eval", action="store_true", help="run the eval suite at the end")
    ap.add_argument("--parity-check", action="store_true",
                    help="report filter-mask agreement vs the numpy oracle")
    ap.add_argument("--f32", action="store_true",
                    help="parity mode: full float32 compute")
    ap.add_argument("--dp", type=int, default=None,
                    help="data-parallel devices (-1 = all)")
    ap.add_argument("--eval-samples", type=int, default=500)
    ap.add_argument("--describe", action="store_true",
                    help="print the model/memory breakdown and exit")
    args = ap.parse_args(argv)

    from .config import PRESETS, ExperimentConfig, get_preset

    if args.list:
        for name, cfg in sorted(PRESETS.items()):
            print(f"{name:24s} arch={cfg.model.arch:8s} strain={cfg.strain.method}")
        return 0

    if args.config:
        if not os.path.exists(args.config):
            print(f"error: config file not found: {args.config}", file=sys.stderr)
            return 2
        with open(args.config) as f:
            cfg = ExperimentConfig.from_json(f.read())
    else:
        try:
            cfg = get_preset(args.preset)
        except KeyError as e:
            print(f"error: {e.args[0]}", file=sys.stderr)
            return 2
    if args.epochs is not None:
        cfg = cfg.replace(train=dataclasses.replace(cfg.train, epochs=args.epochs))
    if args.batch_size is not None:
        cfg = cfg.replace(data=dataclasses.replace(cfg.data, batch_size=args.batch_size))
    if args.f32:
        cfg = cfg.replace(model=dataclasses.replace(cfg.model, compute_dtype="float32"))
    if args.dp is not None:
        cfg = cfg.replace(parallel=dataclasses.replace(cfg.parallel, dp=args.dp))
    if args.eval:
        cfg = force_eval_suite(cfg, args.eval_samples)

    from .train.loop import Trainer
    from .obs.images import save_image_grid

    t0 = time.time()
    trainer = Trainer(cfg, max_synth=args.max_synth)
    print(f"[strainer] {cfg.name}: dataset n={trainer.dataset.n}, "
          f"params={trainer.state.params_count():,}", flush=True)

    if args.describe:
        from .utils.trees import dtype_summary, param_count, tree_bytes

        for name, tree in (("G", trainer.state.g_params),
                           ("D", trainer.state.d_params)):
            print(f"[strainer] {name}: params={param_count(tree):,} "
                  f"bytes={tree_bytes(tree):,} dtypes={dtype_summary(tree)}")
        img = trainer.dataset.images
        print(f"[strainer] dataset HBM: {img.size * img.dtype.itemsize:,} "
              f"bytes ({img.shape} {img.dtype})")
        return 0

    start_epoch = 0
    if args.resume:
        from .checkpoint import restore_checkpoint

        trainer.setup()
        start_epoch = restore_checkpoint(args.resume, trainer)
        print(f"[strainer] resumed from epoch {start_epoch - 1}")
    else:
        trainer.setup()

    epoch_infos = []
    for epoch in range(start_epoch, cfg.train.epochs):
        info = trainer.run_epoch(epoch)
        epoch_infos.append(info)
        if args.out and args.checkpoint_every and (epoch + 1) % args.checkpoint_every == 0:
            from .checkpoint import save_checkpoint

            save_checkpoint(os.path.join(args.out, "ckpt"), trainer, epoch)
        if (
            args.out and args.save_samples_every
            and (epoch + 1) % args.save_samples_every == 0
        ):
            # per-epoch sample PNGs (`#8.py:144-147`: every 10 epochs)
            imgs = trainer.sample(25)
            if imgs.ndim == 2:
                s_ = cfg.data.image_size
                imgs = imgs.reshape(-1, s_, s_, cfg.model.nc)
            save_image_grid(
                imgs, os.path.join(args.out, f"samples_epoch{epoch + 1}.png"),
                nrow=5,
            )

    results = dict(
        name=cfg.name,
        wall_s=round(time.time() - t0, 2),
        epochs=len(epoch_infos),
        summary=trainer.logger.summary(),
    )
    if args.parity_check:
        from .parity.agreement import agreement_report

        results["parity"] = agreement_report(trainer, epoch=cfg.train.epochs - 1)
    if args.eval:
        from .eval.suite import evaluate_run

        results["eval"] = evaluate_run(
            cfg, trainer.gen, trainer.state, trainer.dataset,
            n_samples=args.eval_samples,
        )
    if args.out:
        os.makedirs(args.out, exist_ok=True)
        from .obs.plots import save_loss_curves, save_score_histogram

        if trainer.logger.G_losses:
            save_loss_curves(trainer.logger.G_losses, trainer.logger.D_losses,
                             os.path.join(args.out, "losses.png"))
        if trainer.engine.last_scores is not None:
            import numpy as _np

            save_score_histogram(
                _np.asarray(trainer.engine.last_scores),
                None if trainer.engine.last_threshold is None
                else float(trainer.engine.last_threshold),
                os.path.join(args.out, "strain_scores.png"),
            )
        imgs = trainer.sample(64)
        if imgs.ndim == 2:
            s = cfg.data.image_size
            imgs = imgs.reshape(-1, s, s, cfg.model.nc)
        save_image_grid(imgs, os.path.join(args.out, "samples.png"))
        with open(os.path.join(args.out, "metrics.json"), "w") as f:
            json.dump(results, f, indent=2)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
