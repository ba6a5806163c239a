#!/usr/bin/env python
"""Inference CLI (entry parity with the reference: inference.py:292-308).

    python inference.py --config_path tasks/X.yaml [--write_layers]
                        [--postprocess_only] [--resume]
"""

import argparse

from mt3d_resenc_unet_tpu.infer.engine import ZarrInferenceEngine


def main():
    parser = argparse.ArgumentParser(
        description="Sliding-window zarr inference for the multi-task "
                    "3D ResEnc U-Net.")
    parser.add_argument("--config_path", type=str, required=True,
                        help="Path to your config file (same one used "
                             "for training).")
    parser.add_argument("--write_layers", action="store_true",
                        help="Write per-Z JPEG slices of the final outputs.")
    parser.add_argument("--postprocess_only", action="store_true",
                        help="Skip the model pass; only average/quantize "
                             "existing sum/count arrays.")
    parser.add_argument("--resume", action="store_true",
                        help="Continue an interrupted model pass from its "
                             "tile watermark instead of aborting on an "
                             "existing store.")
    args = parser.parse_args()

    engine = ZarrInferenceEngine(
        config_file=args.config_path,
        write_layers=args.write_layers,
        postprocess_only=args.postprocess_only,
        resume=args.resume,
    )
    engine.infer()


if __name__ == "__main__":
    main()
