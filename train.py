#!/usr/bin/env python
"""Training CLI (entry parity with the reference: train.py:341-350).

    python train.py --config_path tasks/X.yaml [--debug_dataloader] [--verbose]
"""

import argparse


def main():
    parser = argparse.ArgumentParser(
        description="Train a TPU-native multi-task 3D ResEnc U-Net.")
    parser.add_argument("--config_path", type=str, required=True,
                        help="Path to your YAML config file.")
    parser.add_argument("--debug_dataloader", action="store_true",
                        help="Dump 25 dataset samples as TIFFs and exit.")
    parser.add_argument("--verbose", action="store_true")
    args = parser.parse_args()

    # multi-host: must run before any backend-initializing JAX call
    # (no-op single-process; parallel/distributed.py)
    from mt3d_resenc_unet_tpu.parallel.distributed import initialize
    initialize()

    from mt3d_resenc_unet_tpu.train.trainer import Trainer
    trainer = Trainer(args.config_path, verbose=args.verbose,
                      debug_dataloader=args.debug_dataloader)
    trainer.train()


if __name__ == "__main__":
    main()
