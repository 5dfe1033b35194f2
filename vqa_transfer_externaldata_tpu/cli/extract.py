"""Feature-extraction CLI (reference C4's offline extraction script):
COCO/VG images (optionally region crops from the vlmap artifacts) ->
HDF5 of 14x14x2048 grids + pool5.

    # whole images (VQA): store row k = k-th image, ids from filenames
    python -m vqa_transfer_externaldata_tpu.cli.extract \
        --image_dir /data/coco/train2014 --out features_train.hdf5 \
        [--pattern "*.jpg"] [--batch_size 32] [--image_size 448] \
        [--torch_checkpoint resnet101.pth]

    # region crops (stage-1): store row r = region_index r of the vlmap
    # artifacts (data/visualgenome region_meta.npz), so vlmap training's
    # region_index join hits the right rows by position
    python -m vqa_transfer_externaldata_tpu.cli.extract \
        --image_dir /data/vg/images --out region_feats.hdf5 \
        --regions <vlmap_out_dir>/region_meta.npz
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import sys
from typing import Optional, Sequence

from vqa_transfer_externaldata_tpu.data.features import extract_features
from vqa_transfer_externaldata_tpu.utils.logging import log


def image_id_from_name(path: str) -> int:
    """COCO/VG id = trailing integer of the stem (COCO_train2014_000000123)."""
    stem = os.path.splitext(os.path.basename(path))[0]
    m = re.search(r"(\d+)$", stem)
    return int(m.group(1)) if m else abs(hash(stem)) % (1 << 62)


def main(argv: Optional[Sequence[str]] = None) -> str:
    p = argparse.ArgumentParser("extract")
    p.add_argument("--image_dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--pattern", default="*.jpg")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--image_size", type=int, default=448)
    p.add_argument("--torch_checkpoint", default=None,
                   help="torchvision-format resnet101 state_dict (.pth)")
    p.add_argument("--format", default="hdf5", choices=("hdf5", "raw"),
                   help="raw = mmap directory served by the native "
                        "multi-threaded gather (fastest at train time)")
    p.add_argument("--regions", default=None,
                   help="region_meta.npz from the visualgenome "
                        "preprocessing: extract per-region CROP features, "
                        "row r = region_index r (stage-1 feature store)")
    args = p.parse_args(argv)

    found = sorted(glob.glob(os.path.join(args.image_dir, args.pattern)))
    if not found:
        raise FileNotFoundError(
            f"no images matching {args.pattern} under {args.image_dir}")

    boxes = None
    if args.regions:
        import numpy as np

        meta = np.load(args.regions)
        by_id = {image_id_from_name(q): q for q in found}
        missing = sorted(set(meta["image_id"].tolist()) - set(by_id))
        if missing:
            raise FileNotFoundError(
                f"{len(missing)} region image ids have no file under "
                f"{args.image_dir} (first: {missing[:5]})")
        paths = [by_id[int(i)] for i in meta["image_id"]]
        boxes = [tuple(int(v) for v in b) for b in meta["bbox"]]
        ids = list(range(len(paths)))  # row r == region_index r
        log.info("extracting %d region crops over %d images",
                 len(paths), len(by_id))
    else:
        paths = found
        ids = [image_id_from_name(q) for q in paths]
        log.info("extracting %d images from %s", len(paths),
                 args.image_dir)

    variables = None
    if args.torch_checkpoint:
        import torch

        from vqa_transfer_externaldata_tpu.ops.resnet import (
            convert_torch_state_dict)

        sd = torch.load(args.torch_checkpoint, map_location="cpu",
                        weights_only=True)
        params, stats = convert_torch_state_dict(
            {k: v.numpy() for k, v in sd.items()}, stem="space_to_depth")
        variables = {"params": params, "batch_stats": stats}
        log.info("loaded pretrained ResNet-101 from %s",
                 args.torch_checkpoint)

    return extract_features(paths, ids, args.out, boxes=boxes,
                            batch_size=args.batch_size,
                            image_size=args.image_size,
                            variables=variables, fmt=args.format)


if __name__ == "__main__":
    main(sys.argv[1:])
