"""Fuse FrozenBatchNorm statistics into conv kernels in a checkpoint.

Parity with the reference ``tools/fuse_conv_bn.py:1-68``; the JAX analogue
is a pure pytree transform (`lsnet_tpu/train/fuse.py`) that preserves the
tree structure, so the fused checkpoint loads into the same compiled model.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(
        description="fuse Conv and BN layers in a checkpoint")
    parser.add_argument("in_file", help="input orbax checkpoint dir")
    parser.add_argument("out_file", help="output orbax checkpoint dir")
    args = parser.parse_args()

    import orbax.checkpoint as ocp

    from lsnet_tpu.train.fuse import fuse_conv_bn

    ckptr = ocp.PyTreeCheckpointer()
    state = ckptr.restore(os.path.abspath(args.in_file))
    variables = {k: state[k] for k in ("params", "batch_stats")
                 if k in state}
    fused, names = fuse_conv_bn(variables)
    for k in fused:
        state[k] = fused[k]
    ckptr.save(os.path.abspath(args.out_file), state, force=True)
    print(f"fused {len(names)} conv+bn pairs -> {args.out_file}")
    for n in names[:10]:
        print("  ", n)
    if len(names) > 10:
        print(f"   ... and {len(names) - 10} more")


if __name__ == "__main__":
    main()
