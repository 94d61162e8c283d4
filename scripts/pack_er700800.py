"""Pack the ER-[700-800] training dirs into the memory-mapped chunk format
(difusco_tpu/data/mis.py pack_mis_dir). Incremental and resumable: complete
chunks are skipped, a partial trailing chunk is only written once its source
dir is fully labeled — safe to re-run behind the labeling pipelines.

Usage: python scripts/pack_er700800.py  (repeat as labels accumulate)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from difusco_tpu.data.mis import pack_mis_dir

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SETS = [
    ("mis_er700800_train", "mis_er700800_train_labels", "er700800_train"),
    ("mis_er700800_train3a", "mis_er700800_train3a_labels",
     "er700800_train3a"),
    ("mis_er700800_train3b", "mis_er700800_train3b_labels",
     "er700800_train3b"),
]


def main():
    total = 0
    for src, lab, dst in SETS:
        src_glob = os.path.join(REPO, "data", src, "*.gpickle")
        lab_dir = os.path.join(REPO, "data", lab)
        out_dir = os.path.join(REPO, "data", "packs", dst)
        if not os.path.isdir(os.path.dirname(src_glob)):
            continue
        n = pack_mis_dir(src_glob, lab_dir, out_dir, chunk=1024)
        print(f"{dst}: {n} graphs packed")
        total += n
    print(f"total packed: {total}")


if __name__ == "__main__":
    main()
