"""Prepare a trained checkpoint for publication.

Parity with the reference ``tools/publish_model.py:16-28``: strip the
optimizer state (params + batch_stats + meta only), write a portable
single-file artifact, and stamp the filename with the content hash.

The input is an orbax checkpoint directory as written by
``lsnet_tpu.train.checkpoint.save_checkpoint`` (a full train state); the
output is a flat ``.npz`` whose keys are ``params/...`` / ``batch_stats/...``
slash-joined paths — loadable anywhere with numpy alone.
"""

import argparse
import hashlib
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten(v, f"{prefix}/{k}" if prefix else k))
    else:
        out[prefix] = np.asarray(tree)
    return out


def process_checkpoint(in_file: str, out_file: str) -> str:
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    state = ckptr.restore(os.path.abspath(in_file))
    # keep only what inference needs — reference: `del checkpoint['optimizer']`
    slim = {k: state[k] for k in ("params", "batch_stats") if k in state}
    if "meta" in state:
        slim["meta"] = state["meta"]
    flat = flatten(slim)
    if out_file.endswith(".npz"):
        out_file = out_file[:-4]
    np.savez_compressed(out_file + ".tmp.npz", **flat)
    with open(out_file + ".tmp.npz", "rb") as f:
        sha = hashlib.sha256(f.read()).hexdigest()
    final = f"{out_file}-{sha[:8]}.npz"
    os.replace(out_file + ".tmp.npz", final)
    return final


def load_published(path: str):
    """Inverse of :func:`process_checkpoint`: npz -> nested variables dict."""
    out = {}
    with np.load(path) as z:
        for key in z.files:
            parts = key.split("/")
            d = out
            for p in parts[:-1]:
                d = d.setdefault(p, {})
            d[parts[-1]] = z[key]
    return out


def main():
    parser = argparse.ArgumentParser(
        description="Process a checkpoint to be published")
    parser.add_argument("in_file", help="input orbax checkpoint dir")
    parser.add_argument("out_file", help="output filename (.npz)")
    args = parser.parse_args()
    final = process_checkpoint(args.in_file, args.out_file)
    print(f"published: {final}")


if __name__ == "__main__":
    main()
