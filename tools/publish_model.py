#!/usr/bin/env python
"""Hash-stamp a checkpoint for publishing (reference: tools/publish_model.py)."""
import argparse, hashlib, os, shutil, sys

p = argparse.ArgumentParser()
p.add_argument("in_path")
p.add_argument("out_prefix")
args = p.parse_args()

def file_digest(path):
    h = hashlib.sha256()
    if os.path.isdir(path):
        for root, _, files in sorted(os.walk(path)):
            for f in sorted(files):
                h.update(open(os.path.join(root, f), "rb").read())
    else:
        h.update(open(path, "rb").read())
    return h.hexdigest()[:8]

digest = file_digest(args.in_path)
out = f"{args.out_prefix}-{digest}"
if os.path.isdir(args.in_path):
    shutil.copytree(args.in_path, out, dirs_exist_ok=True)
else:
    shutil.copy(args.in_path, out)
print(out)
