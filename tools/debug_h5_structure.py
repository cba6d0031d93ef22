#!/usr/bin/env python
"""HDF5 key/shape inspector for the DUKE pack (port of reference root
`debug_h5_structure.py`)."""

from __future__ import annotations

import argparse

import h5py


def describe(path, limit: int = 5):
    with h5py.File(path, "r") as f:
        keys = list(f.keys())
        print(f"{path}: {len(keys)} top-level groups")
        for k in keys[:limit]:
            grp = f[k]
            print(f"  {k}/")
            for name, ds in grp.items():
                print(f"    {name}: shape={ds.shape} dtype={ds.dtype}")
        if len(keys) > limit:
            print(f"  ... and {len(keys) - limit} more")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--h5", required=True)
    ap.add_argument("--limit", type=int, default=5)
    args = ap.parse_args(argv)
    describe(args.h5, args.limit)


if __name__ == "__main__":
    main()
