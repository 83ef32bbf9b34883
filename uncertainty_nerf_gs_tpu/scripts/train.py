"""`unc-train` CLI: train any registered method on a parsed dataset.

The `ns-train <method> --data ... <dataparser>` surface of the reference
(`/root/reference/README.md:102-105`) without nerfstudio: method +
dataparser registries resolve the model/data, the trainer runs the jitted
loop with periodic `step-*.ckpt` orbax checkpoints (steps_per_save=2000,
`laplace_config.py:25`), and a `config.json` is written next to the
checkpoints so `unc-eval` can round-trip the run (the reference round-trips
`config.yml` through yaml, `ensemble_utils.py:131`).

Usage:
    python -m uncertainty_nerf_gs_tpu.scripts.train active-nerfacto \
        --data /path/to/scene --dataparser blender-data \
        --max-num-iterations 30000 --output-dir outputs/run1 --seed 0
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time
from pathlib import Path

import numpy as np

from uncertainty_nerf_gs_tpu.configs.methods import METHODS, get_method
from uncertainty_nerf_gs_tpu.data.dataparsers import DATAPARSERS
from uncertainty_nerf_gs_tpu.data.datasets import load_images, load_masks
from uncertainty_nerf_gs_tpu.engine.checkpointing import save_checkpoint

# Dataparsers whose whole point is few-view supervision; they flip the
# nerfacto-family grid layout to "corner" (see build_trainer).
SPARSE_VIEW_DATAPARSERS = frozenset(
    {"sparse-nerfstudio", "sparse-blender", "sparse-mipnerf360"}
)


def build_trainer(method_name: str, data: Path, dataparser: str,
                  seed: int = 0, parser_kwargs: dict | None = None,
                  config_overrides: dict | None = None,
                  camera_opt: str = "default",
                  grad_checkpoint: bool = False):
    """Resolve method + dataparser and construct the right trainer.

    camera_opt: "default" follows the method spec (reference parity:
    SO3xR3 ON for nerfacto-family); "off"/"on" force it — e.g. synthetic
    scenes with exact poses, where free pose tangents can gauge-drift the
    reconstruction away from the untouched eval cameras.
    """
    spec = get_method(method_name)
    if camera_opt != "default":
        spec = dataclasses.replace(
            spec, use_camera_optimizer=(camera_opt == "on")
        )
    parse = DATAPARSERS[dataparser]
    outputs = parse(Path(data), "train", **(parser_kwargs or {}))
    images = load_images(outputs)

    cfg = spec.model_config
    if (
        spec.family == "nerfacto"
        and dataparser in SPARSE_VIEW_DATAPARSERS
        and "grid_layout" not in (config_overrides or {})
    ):
        # Sparse-view captures are a core reference experiment
        # (`sparse_nerfstudio_dataparser.py:189-238`): corner sharing is a
        # protective prior under few-view supervision (cell overfits,
        # experiments/layout_quality.py). Measured on the 12-view scene at
        # equal budget: cell 22.1 / hybrid 23.4 / corner 26.8 / hybrid +
        # face-consistency@1.0 28.7 dB PSNR — and hybrid trains ~12x
        # faster per step than corner (row gathers vs 8-corner gathers),
        # so sparse parsers default to hybrid + the face regularizer.
        cfg = dataclasses.replace(
            cfg, grid_layout="hybrid", face_consistency_mult=1.0
        )
    if config_overrides:
        cfg = dataclasses.replace(cfg, **config_overrides)

    if spec.family == "splatfacto":
        from uncertainty_nerf_gs_tpu.engine.splat_trainer import SplatfactoTrainer

        trainer = SplatfactoTrainer(
            config=cfg,
            cameras=outputs.cameras,
            images=images,
            seed=seed,
            points=outputs.metadata.get("points3D_xyz"),
            point_colors=outputs.metadata.get("points3D_rgb"),
        )
    else:
        from uncertainty_nerf_gs_tpu.engine.trainer import NerfactoTrainer

        cfg = dataclasses.replace(cfg, num_images=len(outputs.cameras))
        trainer = NerfactoTrainer(
            config=cfg, cameras=outputs.cameras, images=images, seed=seed,
            use_camera_optimizer=spec.use_camera_optimizer,
            masks=load_masks(outputs),
            gradient_checkpointing=grad_checkpoint,
        )
    return trainer, spec, outputs


def _trainer_state(trainer) -> dict:
    return trainer.state_dict()


def main(argv: list[str] | None = None) -> Path:
    ap = argparse.ArgumentParser(description="train an uncertainty method")
    ap.add_argument("method", choices=sorted(METHODS))
    ap.add_argument("--data", required=True)
    ap.add_argument("--dataparser", default="blender-data", choices=sorted(DATAPARSERS))
    ap.add_argument("--output-dir", default="outputs/run")
    ap.add_argument("--max-num-iterations", type=int, default=None)
    ap.add_argument("--steps-per-save", type=int, default=None)
    ap.add_argument("--steps-per-eval-image", type=int, default=0,
                    help="render train image 0 every N steps and log PSNR "
                         "(reference trainer's in-training eval hooks)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--load-dir", default=None,
                    help="resume from the latest step-*.ckpt in this dir "
                         "(restores params + optimizer state + step)")
    ap.add_argument("--camera-opt", default="default",
                    choices=["default", "on", "off"],
                    help="override the method's camera-optimizer setting")
    ap.add_argument("--log-every", type=int, default=500)
    ap.add_argument("--grad-checkpoint", action="store_true",
                    help="nerfacto-family: rematerialize the model forward "
                         "in the backward (jax.checkpoint) — trades FLOPs "
                         "for HBM; required for >8k-ray batches at "
                         "reference scale (evidence/step_profile_r5.json)")
    ap.add_argument("--steps-per-launch", type=int, default=50,
                    help="nerfacto-family: train steps fused into one "
                         "jitted lax.scan launch (amortizes per-step host "
                         "dispatch, which dominates on remote-attached "
                         "chips); 1 = the per-step loop. Bit-identical "
                         "results either way (RNG key carried through the "
                         "scan). Splat training refines between launches "
                         "and ignores this.")
    ap.add_argument("--viewer-port", type=int, default=0,
                    help="serve the live training viewer on this port "
                         "(reference `vis=\"viewer\"` during training, "
                         "`laplace_config.py:55`); 0 = off")
    ap.add_argument("--viewer-downscale", type=int, default=4)
    ap.add_argument("--parser-kwargs", type=json.loads, default={},
                    help='JSON dict forwarded to the dataparser')
    ap.add_argument("--overrides", type=json.loads, default={},
                    help='JSON dict of model-config overrides')
    args, extra = ap.parse_known_args(argv)

    # tyro-style dotted flags (`--model.beta-min 0.02`, reference surface
    # `--pipeline.model.X`, README:122): resolved against the method's
    # model-config dataclass and merged over --overrides JSON
    if extra:
        from uncertainty_nerf_gs_tpu.configs.flags import parse_dotted_flags

        dotted, special = parse_dotted_flags(
            extra, get_method(args.method).model_config
        )
        args.overrides = {**args.overrides, **dotted}
        if "camera_opt" in special:
            args.camera_opt = special["camera_opt"]

    trainer, spec, _ = build_trainer(
        args.method, args.data, args.dataparser, args.seed,
        args.parser_kwargs, args.overrides, camera_opt=args.camera_opt,
        grad_checkpoint=args.grad_checkpoint,
    )
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    run_cfg = {
        "method": args.method,
        "data": str(args.data),
        "dataparser": args.dataparser,
        "parser_kwargs": args.parser_kwargs,
        "overrides": args.overrides,
        "seed": args.seed,
        "camera_opt": args.camera_opt,
    }
    with open(out_dir / "config.json", "w") as f:
        json.dump(run_cfg, f, indent=2)
    # the reference round-trips trained-run configs as YAML (config.yml
    # written by the trainer, reloaded at `ensemble_utils.py:131`); write
    # the same file so either format reloads through unc-eval
    import yaml

    with open(out_dir / "config.yml", "w") as f:
        yaml.safe_dump(run_cfg, f, sort_keys=False)

    from uncertainty_nerf_gs_tpu.utils.writer import ScalarWriter

    writer = ScalarWriter(out_dir / "events.jsonl")
    if args.viewer_port:
        import threading

        from uncertainty_nerf_gs_tpu.scripts.viewer import (
            LiveViewerState,
            serve,
        )

        viewer_state = LiveViewerState(
            trainer, spec, downscale=args.viewer_downscale
        )
        server = serve(viewer_state, port=args.viewer_port)
        threading.Thread(target=server.serve_forever, daemon=True).start()
        print(f"live viewer: http://127.0.0.1:{server.server_address[1]} "
              f"({viewer_state.width}x{viewer_state.height}, "
              f"modes {viewer_state.modes})")
    total = args.max_num_iterations or spec.max_num_iterations
    save_every = args.steps_per_save or spec.steps_per_save
    t0 = time.perf_counter()
    done = 0
    if args.load_dir:
        from uncertainty_nerf_gs_tpu.engine.checkpointing import (
            latest_checkpoint,
            load_checkpoint,
        )

        ckpt_path = latest_checkpoint(Path(args.load_dir))
        if ckpt_path is None:
            raise FileNotFoundError(f"no step-*.ckpt under {args.load_dir}")
        ckpt = load_checkpoint(ckpt_path, target=_trainer_state(trainer))
        trainer.restore(ckpt)
        done = int(np.asarray(ckpt["step"]))
        print(f"resumed from {ckpt_path} at step {done}")
    while done < total:
        n = min(save_every, total - done)
        if spec.family == "splatfacto":
            losses = trainer.train(n, log_every=args.log_every, writer=writer)
        else:
            losses = trainer.train(
                n, num_rays_per_batch=spec.num_rays_per_batch,
                log_every=args.log_every, writer=writer,
                steps_per_launch=max(1, args.steps_per_launch),
            )
        done += n
        save_checkpoint(out_dir, done, _trainer_state(trainer))
        if args.steps_per_eval_image and done % args.steps_per_eval_image == 0:
            import jax.numpy as jnp

            from uncertainty_nerf_gs_tpu.metrics import psnr

            img = trainer.render_image(0)
            p = float(psnr(jnp.asarray(img["rgb"]), jnp.asarray(trainer.images[0])))
            writer.write(done, {"eval_psnr_train0": p})
            print(f"[{done}] train-view psnr={p:.2f}")
        rate = done / (time.perf_counter() - t0)
        print(f"[{done}/{total}] {rate:.1f} steps/s "
              + " ".join(f"{k}={v:.4f}" for k, v in losses.items()))
    print(f"training done: {out_dir}")
    return out_dir


if __name__ == "__main__":
    main()
