"""One-time extraction of the HLL++ empirical bias-correction tables.

These constants are the published supplementary data of
Heule, Nunkesser, Hall — "HyperLogLog in Practice" (EDBT 2013),
https://docs.google.com/document/d/1gyjfMHy43U9OWBXxfaeG-3MjGzejW1dlpyMwEYAAWEI
(rawEstimateData / biasData, precisions 4..18).

The reference implementation (/root/reference/HyperLogLog/BiasCorrection.cs:98-841)
embeds the same published tables; we parse the numeric constants out of it once
and store them as a compressed .npz consumed by hyperloglog_spark.sketch.bias.
Only data (published numeric constants) is extracted — no code.
"""

import re

import numpy as np

SRC = "/root/reference/HyperLogLog/BiasCorrection.cs"
OUT = "/root/repo/hyperloglog_spark/sketch/hllpp_bias_tables.npz"


def main() -> None:
    text = open(SRC, encoding="utf-8").read()
    # Arrays appear as: RawEstimate[k] = new[] { 11, 11.717, ... };
    pat = re.compile(
        r"(RawEstimate|BiasData)\[(\d+)\s*-\s*BitsIndexOffset\]\s*=\s*new\[\]\s*\{([^}]*)\}",
        re.S,
    )
    raw: dict[int, np.ndarray] = {}
    bias: dict[int, np.ndarray] = {}
    for kind, p_str, body in pat.findall(text):
        vals = np.array(
            [float(tok) for tok in re.split(r"[,\s]+", body.strip()) if tok],
            dtype=np.float64,
        )
        p = int(p_str)
        (raw if kind == "RawEstimate" else bias)[p] = vals

    assert sorted(raw) == list(range(4, 19)), sorted(raw)
    assert sorted(bias) == list(range(4, 19)), sorted(bias)
    arrays = {}
    for p in range(4, 19):
        assert len(raw[p]) == len(bias[p]), (p, len(raw[p]), len(bias[p]))
        # The published tables contain a handful of adjacent swaps at p=5,6
        # (known wart in the Heule et al. supplementary data); binary search
        # remains well-behaved everywhere else, so keep the data verbatim.
        n_bad = int(np.sum(np.diff(raw[p]) <= 0))
        assert n_bad == 0 or p in (5, 6), f"unsorted raw estimates p={p}: {n_bad}"
        arrays[f"raw_{p}"] = raw[p]
        arrays[f"bias_{p}"] = bias[p]
    np.savez_compressed(OUT, **arrays)
    print(f"wrote {OUT}: " + ", ".join(f"p{p}:{len(raw[p])}" for p in sorted(raw)))


if __name__ == "__main__":
    main()
