"""Export a training run to the REFERENCE's torch checkpoint format.

Rebuilds the trainer from a run directory's persisted ``config.json``
(written by ``prepare_config``), restores its latest (or given) orbax
checkpoint, and writes the reference save dict:

  stage 2 (default): ``{step, epoch, vae_image, vae_semseg, unet, ema?}``
      — ``trainers_ldm_cond.py:1844-1877`` — loadable by the torch stack
      and by our own ``pretrained_ldm_path`` warm start.
  stage 1 (``--stage ae``): ``{'vae': <GeneralVAESeg state dict>}``
      — ``trainers_ae.py:534-548``.

Usage:
  python -m ldmseg_tpu.tools.export_checkpoint \
      --run_dir /path/to/run_0 --out model.pt [--stage ldm|ae]
      [--ckpt step_1000] [--ema]
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--run_dir", required=True,
                    help="run directory containing config.json")
    ap.add_argument("--out", required=True, help="output .pt path")
    ap.add_argument("--stage", choices=("ldm", "ae"), default="ldm")
    ap.add_argument("--ckpt", default=None,
                    help="checkpoint name under checkpoints/ "
                         "(default: newest step_*)")
    ap.add_argument("--ema", action="store_true",
                    help="export the EMA shadow weights")
    args = ap.parse_args(argv)

    cfg_path = os.path.join(args.run_dir, "config.json")
    with open(cfg_path) as f:
        cfg = json.load(f)
    cfg["checkpoint_dir"] = os.path.join(args.run_dir, "checkpoints")

    from ldmseg_tpu.data import SyntheticDVPS, Loader

    vk = cfg["vae_model_kwargs"]
    bits = max(1, int(vk.get("in_channels", 10)) // 2)
    ds = SyntheticDVPS(length=2, size=(64, 128), num_bits=bits,
                       num_classes=min(20, 2**bits),
                       ignore_label=cfg.get("ignore_label", 0))
    batch = next(iter(Loader(ds, 2, shuffle=False)))

    if args.stage == "ae":
        from ldmseg_tpu.train.trainer_ae import TrainerAE
        tr = TrainerAE(cfg, dataset=ds,
                       results_folder=cfg["checkpoint_dir"])
    else:
        from ldmseg_tpu.train.trainer_ldm import TrainerDiffusion
        from ldmseg_tpu.tools.main_ldm import build_unet_config
        tr = TrainerDiffusion(cfg, unet_config=build_unet_config(cfg),
                              dataset=ds,
                              results_folder=cfg["checkpoint_dir"])
    tr.init_state(batch)
    tr.resume(os.path.join(cfg["checkpoint_dir"], args.ckpt)
              if args.ckpt else None)
    path = tr.export_reference(args.out, use_ema=args.ema)
    print(f"exported {args.stage} checkpoint (step {int(tr.state.step)}) "
          f"-> {path}")
    return path


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
