"""Compare two tensor-dump folders (reference `debug_utils/dump_comparator.py`).

Usage:
    python scripts/dump_compare.py RUN_A_DIR RUN_B_DIR [--atol 1e-5]

Each folder holds `NNNNNN_extend.npz` / `NNNNNN_decode.npz` files written
by the engine under `--debug-tensor-dump-output-folder`
(model_runner._dump_write).  Prints per-step, per-array max-abs-diff and
the FIRST divergence location (step, array, layer for hiddens); exits 1
on any diff above tolerance.
"""

import argparse
import os
import sys

import numpy as np


def compare(dir_a: str, dir_b: str, atol: float = 0.0) -> int:
    files_a = sorted(f for f in os.listdir(dir_a) if f.endswith(".npz"))
    files_b = sorted(f for f in os.listdir(dir_b) if f.endswith(".npz"))
    if files_a != files_b:
        print(f"file sets differ: {len(files_a)} vs {len(files_b)}")
        only_a = set(files_a) - set(files_b)
        only_b = set(files_b) - set(files_a)
        if only_a:
            print("  only in A:", sorted(only_a)[:5])
        if only_b:
            print("  only in B:", sorted(only_b)[:5])
    bad = 0
    first = None
    for fname in files_a:
        if fname not in files_b:
            continue
        a = np.load(os.path.join(dir_a, fname))
        b = np.load(os.path.join(dir_b, fname))
        keys = sorted(set(a.files) | set(b.files))
        for k in keys:
            if k not in a.files or k not in b.files:
                print(f"{fname}:{k}: missing on one side")
                bad += 1
                continue
            ta, tb = a[k], b[k]
            if ta.shape != tb.shape:
                print(f"{fname}:{k}: shape {ta.shape} vs {tb.shape}")
                bad += 1
                continue
            if ta.dtype.kind in "iub":
                diff = int((ta != tb).sum())
                if diff:
                    print(f"{fname}:{k}: {diff} differing elements (int)")
                    bad += 1
                    if first is None:
                        first = (fname, k, None)
                continue
            d = np.abs(ta.astype(np.float64) - tb.astype(np.float64))
            mx = float(d.max()) if d.size else 0.0
            if mx > atol:
                loc = np.unravel_index(int(d.argmax()), d.shape)
                layer = loc[0] if k == "hidden" else None
                print(
                    f"{fname}:{k}: max|diff|={mx:.3e} at {loc}"
                    + (f" (layer {layer})" if layer is not None else "")
                )
                bad += 1
                if first is None:
                    first = (fname, k, layer)
    if bad:
        print(f"\nDIVERGED: {bad} arrays differ; first at {first}")
        return 1
    print(f"OK: {len(files_a)} dump files match (atol={atol})")
    return 0


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("dir_a")
    p.add_argument("dir_b")
    p.add_argument("--atol", type=float, default=0.0)
    args = p.parse_args()
    sys.exit(compare(args.dir_a, args.dir_b, args.atol))
