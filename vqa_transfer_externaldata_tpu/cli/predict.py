"""Prediction CLI: answer questions with a trained run.

    # precomputed-feature models: features from a store + image ids
    python -m vqa_transfer_externaldata_tpu.cli.predict \
        --train_dir runs/vqa --feature_path feats.hdf5 \
        --image_id 123 --question "what color is the dog?"

    # raw-image model: a JPEG
    python -m vqa_transfer_externaldata_tpu.cli.predict \
        --train_dir runs/e2e --image dog.jpg --question "..."

Multiple --question flags batch together; output is one JSON line
``{"answers": [...]}``.
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Optional, Sequence

import numpy as np

from vqa_transfer_externaldata_tpu.serving import Predictor


def main(argv: Optional[Sequence[str]] = None) -> list:
    p = argparse.ArgumentParser("predict")
    p.add_argument("--train_dir", required=True)
    p.add_argument("--question", action="append", required=True)
    p.add_argument("--feature_path", default=None,
                   help="feature store (hdf5/npz/raw dir) for grid models")
    p.add_argument("--image_id", type=int, action="append", default=None,
                   help="image id per question (single id broadcasts)")
    p.add_argument("--image", action="append", default=None,
                   help="JPEG path per question (vqa_end2end)")
    p.add_argument("--batch_size", type=int, default=8)
    args = p.parse_args(argv)

    predictor = Predictor(args.train_dir, batch_size=args.batch_size)
    n = len(args.question)
    model = predictor.cfg.model.model

    if model == "vqa_end2end":
        from vqa_transfer_externaldata_tpu.data.ingest import _decode

        paths = args.image or []
        if len(paths) == 1:
            paths = paths * n
        assert len(paths) == n, "--image count must match --question"
        size = predictor.cfg.data.image_size
        # Same decode path as training (native libjpeg when built, PIL
        # fallback) so serving pixels match the training distribution.
        visual = np.stack([_decode(path, size) for path in paths])
    else:
        from vqa_transfer_externaldata_tpu.data.features import FeatureStore

        assert args.feature_path and args.image_id, (
            "grid models need --feature_path and --image_id")
        ids = args.image_id
        if len(ids) == 1:
            ids = ids * n
        store = FeatureStore(args.feature_path)
        rows = np.asarray([store.index_of[i] for i in ids], np.int32)
        feats = store.gather(rows)
        visual = (feats["pool5"] if model == "vqa_baseline"
                  else feats["features"])
        store.close()

    answers = predictor.answer(visual, args.question)
    print(json.dumps({"answers": answers}))
    return answers


if __name__ == "__main__":
    main(sys.argv[1:])
