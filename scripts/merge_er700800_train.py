"""Merge the grown ER-[700-800] training set (train2, from
scripts/grow_er700800_train.sh) into the main train/labels dirs.

Hardlinks data/mis_er700800_train2/er_%05d.gpickle into
data/mis_er700800_train/ with indices offset past the existing files, and
the matching *_unweighted.result labels into data/mis_er700800_train_labels/
— so one glob + one label dir cover the combined 1024 + N set (MISDataset
maps labels by stem, which would collide across dirs otherwise).

Idempotent; refuses to link a graph whose label file is missing.
"""

import glob
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(REPO, "data", "mis_er700800_train2")
SRC_LAB = os.path.join(REPO, "data", "mis_er700800_train2_labels")
DST = os.path.join(REPO, "data", "mis_er700800_train")
DST_LAB = os.path.join(REPO, "data", "mis_er700800_train_labels")


def main():
    marker = os.path.join(DST, ".merged_train2")
    offset_file = os.path.join(DST, ".merge_offset_train2")
    if os.path.exists(marker):
        print("train2 already merged (marker present); nothing to do")
        return 0
    if os.path.exists(offset_file):
        # a prior partial merge fixed the offset; reuse it so re-runs map
        # src index i -> the SAME destination name (os.link is a no-op on
        # already-linked files) instead of duplicating under a new offset
        offset = int(open(offset_file).read())
    else:
        existing = sorted(glob.glob(os.path.join(DST, "er_*.gpickle*")))
        offset = max(
            int(os.path.basename(f).split("_")[1].split(".")[0])
            for f in existing
        ) + 1
        with open(offset_file, "w") as f:
            f.write(str(offset))
    src_files = sorted(glob.glob(os.path.join(SRC, "er_*.gpickle*")))
    linked = skipped = 0
    for f in src_files:
        base = os.path.basename(f)
        stem, rest = base.split(".", 1)
        idx = int(stem.split("_")[1])
        lab = os.path.join(SRC_LAB, f"{stem}_unweighted.result")
        if not os.path.exists(lab):
            skipped += 1
            continue
        new_stem = f"er_{offset + idx:05d}"
        dst = os.path.join(DST, f"{new_stem}.{rest}")
        dst_lab = os.path.join(DST_LAB, f"{new_stem}_unweighted.result")
        if not os.path.exists(dst):
            os.link(f, dst)
        if not os.path.exists(dst_lab):
            os.link(lab, dst_lab)
        linked += 1
    print(f"linked {linked} graphs (offset {offset}), "
          f"{skipped} skipped (no label yet); "
          f"train dir now {len(glob.glob(os.path.join(DST, '*.gpickle*')))}")
    if skipped == 0:
        with open(marker, "w") as f:
            f.write("merged\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
