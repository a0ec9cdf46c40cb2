"""No-training cosine-distance measurement (reference test_efm_v2.py).

Loads a feature store, L2-normalizes rows, pairs anchors with canonical
positives and uniform random different-label negatives, and appends the
per-row cosine similarities to cosine_similarity.csv — one jitted step per
batch instead of the reference's per-row host loops (test_efm_v2.py:146-184).
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--features", help=".npz feature store")
    p.add_argument("--train-img-csv")
    p.add_argument("--train-id-csv")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--out-dir", default="runs/eval_cos")
    p.add_argument("--batch-size", type=int, default=16384)
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from ._common import setup_logging, log_config
    from .train_head import load_features
    from ..data import PairBatcher
    from ..eval.cosine import CosineSimilaritySink, separation_score
    from ..models.heads import LinearHead
    from ..train import (create_train_state, make_head_eval_step, sgd_wd)

    log = setup_logging(os.path.join(args.out_dir, "log"), "eval_cos")
    log_config(log, args)
    feats, labels = load_features(args)
    batch = min(args.batch_size, feats.shape[0])

    # identity "head": measurement only, mirroring the commented-out net in
    # test_efm_v2.py:137-144 being bypassed
    model = LinearHead(out_dim=feats.shape[1])
    state = create_train_state(model, sgd_wd(), jax.random.PRNGKey(args.seed),
                               feats[:1])
    # overwrite with the identity matrix so outputs == normalized inputs
    state = state.replace(params={"proj": {
        "kernel": np.eye(feats.shape[1], dtype=np.float32)}})
    step = jax.jit(make_head_eval_step(model, normalize_inputs=True))

    sink = CosineSimilaritySink(
        os.path.join(args.out_dir, "cosine_similarity.csv"))
    batcher = PairBatcher(feats, labels, batch, shuffle=False)
    all_pos, all_neg = [], []
    with sink:
        for anchor, positive, lab in batcher:
            m = step(state, anchor, positive, lab)
            sink.append(np.asarray(m["pos_cos"]), np.asarray(m["neg_cos"]))
            all_pos.append(np.asarray(m["pos_cos"]))
            all_neg.append(np.asarray(m["neg_cos"]))
    pos = np.concatenate(all_pos) if all_pos else np.zeros(0)
    neg = np.concatenate(all_neg) if all_neg else np.zeros(0)
    log.info("rows=%d mean_pos=%.4f mean_neg=%.4f separation=%.4f",
             len(pos), pos.mean() if len(pos) else 0,
             neg.mean() if len(neg) else 0, separation_score(pos, neg))
    return pos, neg


if __name__ == "__main__":
    main()
