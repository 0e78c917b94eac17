"""Fetch released 3DETR checkpoints and convert them for this framework.

TPU-native counterpart of the reference fetcher
(/root/reference/utils/download_weights.py): downloads a released 3DETR
`.pth` + metrics pickle from the public URL, then converts the torch
state_dict to this framework's flax parameter tree via
`utils/torch_convert.py` so the weights load directly with
`--checkpoint_file`/`--test_ckpt`.

Run as a script:
    python -m coda_neurips2023_tpu.utils.download_weights \
        --dataset scannet --masked --epoch 1080 --out /tmp/3detr
"""

from __future__ import annotations

import argparse
import os
import pickle
from urllib import request

BASE_URL = "https://dl.fbaipublicfiles.com/3detr/checkpoints"


def download(dataset: str, masked: bool, epoch: int, out_dir: str) -> tuple[str, str]:
    """Fetch `{dataset}{_masked}_ep{epoch}.pth` (+ metrics pickle) to out_dir."""
    enc = "_masked" if masked else ""
    weights_file = f"{dataset}{enc}_ep{epoch}.pth"
    metrics_file = f"{dataset}{enc}_ep{epoch}_metrics.pkl"
    os.makedirs(out_dir, exist_ok=True)
    local_weights = os.path.join(out_dir, weights_file)
    local_metrics = os.path.join(out_dir, metrics_file)
    for fname, local in ((weights_file, local_weights), (metrics_file, local_metrics)):
        url = f"{BASE_URL}/{fname}"
        request.urlretrieve(url, local)
        print(f"downloaded {url} -> {local}")
    return local_weights, local_metrics


def convert(local_weights: str, **converter_kw) -> str:
    """Convert the torch state_dict to a flax variables pickle next to it."""
    from coda_neurips2023_tpu.utils.torch_convert import load_reference_checkpoint

    params, batch_stats, constants, logit_scale = load_reference_checkpoint(
        local_weights, **converter_kw
    )
    out = local_weights.rsplit(".", 1)[0] + "_flax.pkl"
    with open(out, "wb") as f:
        pickle.dump(
            {
                "params": params,
                "batch_stats": batch_stats,
                "constants": constants,
                "logit_scale": logit_scale,
            },
            f,
        )
    print(f"converted flax variables -> {out}")
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", default="scannet", choices=["scannet", "sunrgbd"])
    p.add_argument("--masked", action="store_true", help="masked-encoder variant")
    p.add_argument("--epoch", default=1080, type=int)
    p.add_argument("--out", default="/tmp/3detr")
    p.add_argument("--no_convert", action="store_true")
    args = p.parse_args()
    local_weights, local_metrics = download(args.dataset, args.masked, args.epoch, args.out)
    with open(local_metrics, "rb") as fh:
        metrics = pickle.load(fh)
    print(f"released metrics: {metrics if isinstance(metrics, dict) else type(metrics)}")
    if not args.no_convert:
        convert(local_weights)


if __name__ == "__main__":
    main()
