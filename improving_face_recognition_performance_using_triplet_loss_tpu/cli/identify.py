"""Headless enrollment + identification against the native identity store.

The scriptable counterpart of the reference's Register_DB*/Compare_Face_DB
flows (Feature.hpp:453-804): enroll feature rows (deduped, with optional
person metadata) into the durable store, then batch-identify probe features.

  ... cli.identify enroll --store db.fjdb --features gallery.npz
  ... cli.identify match  --store db.fjdb --features probes.npz --sim-th 0.5
"""

from __future__ import annotations

import argparse
import json


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="command", required=True)

    e = sub.add_parser("enroll", help="register features into the store")
    e.add_argument("--store", required=True, help="identity store file")
    e.add_argument("--features", required=True,
                   help=".npz feature store (features+labels)")
    e.add_argument("--names-json", help='{"classes": [...]} mapping labels '
                                        "to names (pack_dataset output)")
    e.add_argument("--select-threshold", type=float, default=0.98,
                   help="keep mutually-dissimilar representatives per "
                        "identity below this cosine (clustering.h rule)")
    e.add_argument("--dedup-threshold", type=float, default=0.99999)

    m = sub.add_parser("match", help="identify probe features")
    m.add_argument("--store", required=True)
    m.add_argument("--features", required=True)
    m.add_argument("--sim-th", type=float, default=0.5)
    m.add_argument("--out", help="write results JSONL here")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import numpy as np

    from ..data import load_feature_store
    from ..serve.native import (NativeIdentityStore,
                                native_select_representatives)

    feats, labels = load_feature_store(args.features)
    dim = feats.shape[1]

    if args.command == "enroll":
        names = None
        if args.names_json:
            with open(args.names_json) as f:
                names = json.load(f)["classes"]
        stored = deduped = 0
        with NativeIdentityStore(args.store, dim) as store:
            for ident in np.unique(labels):
                rows = feats[labels == ident]
                sel = native_select_representatives(
                    rows.astype(np.float32), args.select_threshold)
                name = (names[int(ident)] if names else f"id_{int(ident)}")
                for i in sel:
                    if store.register(name, rows[i],
                                      args.dedup_threshold) >= 0:
                        stored += 1
                    else:
                        deduped += 1
            print(f"enrolled {stored} features ({deduped} deduped); "
                  f"store size {len(store)}")
        return stored

    # match
    results = []
    with NativeIdentityStore(args.store, dim) as store:
        if len(store) == 0:
            raise SystemExit(f"store {args.store} is empty — enroll first")
        for i, fv in enumerate(feats):
            name, sim = store.match(fv, args.sim_th)
            results.append({"probe": int(i),
                            "label": int(labels[i]) if labels is not None else None,
                            "name": name, "similarity": round(float(sim), 6)})
    matched = sum(1 for r in results if r["name"] is not None)
    print(f"matched {matched}/{len(results)} probes above {args.sim_th}")
    if args.out:
        with open(args.out, "w") as f:
            for r in results:
                f.write(json.dumps(r) + "\n")
    return results


if __name__ == "__main__":
    main()
