"""Generate `lldslam_tpu/ops/orb_pattern.npy` — the standard 256-pair ORB/BRIEF
sampling pattern (learned offsets from Rublee et al., "ORB: an efficient
alternative to SIFT or SURF", ICCV 2011; shipped identically in OpenCV and in
every ORB implementation).

This is *numeric data*, not code: the pattern must be bit-identical for ORB
descriptors to be comparable across implementations (and for any standard ORB
vocabulary to score meaningfully — SURVEY.md §7 "descriptor bit-exactness").
We parse the integer table out of the reference's copy of the standard table
(ORBextractor.cc bit_pattern_31_) and store it as an .npy array of shape
(256, 2, 2): [pair, (a, b), (x, y)].
"""
import re
import numpy as np
from pathlib import Path

SRC = Path("/root/reference/src/ORBextractor.cc")
OUT = Path(__file__).resolve().parent.parent / "lldslam_tpu" / "ops" / "orb_pattern.npy"


def main():
    text = SRC.read_text()
    m = re.search(r"bit_pattern_31_\[256\*4\]\s*=\s*\{(.*?)\};", text, re.S)
    assert m, "pattern table not found"
    body = re.sub(r"/\*.*?\*/", "", m.group(1), flags=re.S)
    nums = [int(x) for x in re.findall(r"-?\d+", body)]
    assert len(nums) == 256 * 4, len(nums)
    arr = np.array(nums, dtype=np.int32).reshape(256, 2, 2)
    np.save(OUT, arr)
    print(f"wrote {OUT}: shape {arr.shape}, range [{arr.min()}, {arr.max()}]")


if __name__ == "__main__":
    main()
