#!/usr/bin/env python
"""Sweep fold-model variants through the 9-merge golden check.

Each variant perturbs the fold-side energy model (match posteriors and the
guide tree are unaffected), rebuilds the per-seq BP posteriors + PCT, replays
every progressive merge with golden-restricted inputs (see merge_diagnose.py),
and reports how many merges reproduce the reference's alignment.

Usage: python tools/model_sweep.py [variant ...]   (default: all)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

FLIP_NODES = (12, 15, 17)


def scale_energies(alpha: float):
    """Monkeypatch exp_tables so every Boltzmann factor becomes factor**alpha
    (== all energies scaled by alpha; <1 flattens the ensemble)."""
    from dafs_tpu.ops import energy_params as ep

    if not hasattr(ep, "_orig_exp_tables"):
        ep._orig_exp_tables = ep.exp_tables

    def scaled(bl=True, temperature=ep.TEMP37, kt_mult=1):
        t = ep._orig_exp_tables(bl, temperature, kt_mult)
        out = {}
        for k, v in t.items():
            if k in ("kt", "lxc"):
                out[k] = v
            elif np.isscalar(v):
                out[k] = float(v) ** alpha
            else:
                a = np.asarray(v, np.float64)
                out[k] = np.where(a < 0, a, a ** alpha)  # keep -1 sentinels
        return out

    ep.exp_tables = scaled


ENV_KNOBS = ("DAFS_TPU_ALIFOLD_SPECIAL_HP", "DAFS_TPU_ALIFOLD_MLBASE")


def reset_model():
    from dafs_tpu.ops import energy_params as ep

    if hasattr(ep, "_orig_exp_tables"):
        ep.exp_tables = ep._orig_exp_tables
    ep.set_param_overrides({})
    for k in ENV_KNOBS:
        os.environ.pop(k, None)


def clear_caches():
    from dafs_tpu.ops import alifold, mccaskill

    mccaskill._EXP_CACHE.clear()
    mccaskill._FAST_TABLES.clear()
    alifold._EXP_CACHE.clear()


def variants():
    from dafs_tpu.ops import energy_params as ep

    z3 = np.zeros_like(ep.MISMATCH_EXT_T04)
    d5 = np.broadcast_to(ep._T04_DANGLE5[:, :, None], (8, 5, 5)).copy()
    d3 = np.broadcast_to(ep._T04_DANGLE3[:, None, :], (8, 5, 5)).copy()
    return {
        "base": lambda: None,
        "alpha0.8": lambda: scale_energies(0.8),
        "alpha0.9": lambda: scale_energies(0.9),
        "alpha1.15": lambda: scale_energies(1.15),
        "mmM_zero": lambda: ep.set_param_overrides({"mismatchM": z3}),
        "mmM_d5": lambda: ep.set_param_overrides({"mismatchM": d5}),
        "mmM_d3": lambda: ep.set_param_overrides({"mismatchM": d3}),
        "tau_zero": lambda: ep.set_param_overrides({"terminal_au": 0}),
        "tau_110": lambda: ep.set_param_overrides({"terminal_au": 110}),
    }


def run_variant(name: str, apply) -> None:
    import merge_diagnose as MD
    from dafs_tpu.pipeline import AlnRow

    reset_model()
    apply()
    clear_caches()
    eng, fa, rows_by_id, leaves = MD.setup_engine()
    tree = eng.tree
    ok_nodes = []
    bad_nodes = []
    for node in range(len(fa), len(tree)):
        score, (l, r) = tree[node]
        ids1, ids2 = leaves[l], leaves[r]
        g1 = MD.restrict(rows_by_id, ids1)
        g2 = MD.restrict(rows_by_id, ids2)
        aln1 = [AlnRow(i, g1[i]) for i in ids1]
        aln2 = [AlnRow(i, g2[i]) for i in ids2]
        s, ss, aln = eng._align_alignments(aln1, aln2)
        gm = MD.restrict(rows_by_id, ids1 + ids2)
        ours = {r.seq_id: r.mask for r in aln}
        match = all(
            len(ours[i]) == len(gm[i]) and (ours[i] == gm[i]).all() for i in gm
        )
        (ok_nodes if match else bad_nodes).append(node)
    flips = [n for n in FLIP_NODES if n in ok_nodes]
    breaks = [n for n in bad_nodes if n not in FLIP_NODES]
    print(
        f"[{name:10s}] {len(ok_nodes)}/9 match; "
        f"flip-nodes fixed: {flips or '-'}; newly broken: {breaks or '-'}"
    )
    sys.stdout.flush()


def main() -> None:
    import jax

    from dafs_tpu.utils.aot import setup_compile_cache; setup_compile_cache()
    want = variants()
    want.update(extra_variants())
    want.update(grid_variants())
    names = sys.argv[1:] or list(want)
    for name in names:
        run_variant(name, want[name])
    reset_model()
    clear_caches()


def extra_variants():
    from dafs_tpu.ops import energy_params as ep

    t = ep.bl_tables()
    d5 = np.broadcast_to(ep._T04_DANGLE5[:, :, None], (8, 5, 5)).copy()
    return {
        "mmM_mmH": lambda: ep.set_param_overrides({"mismatchM": t["mismatchH37"]}),
        "mmM_mmI": lambda: ep.set_param_overrides({"mismatchM": t["mismatchI37"]}),
        "tau_84": lambda: ep.set_param_overrides({"terminal_au": 84}),
        "tau110_mmMd5": lambda: ep.set_param_overrides(
            {"terminal_au": 110, "mismatchM": d5}
        ),
        "ali_nospecial": lambda: os.environ.__setitem__(
            "DAFS_TPU_ALIFOLD_SPECIAL_HP", "0"
        ),
        "ali_mlbase": lambda: os.environ.__setitem__(
            "DAFS_TPU_ALIFOLD_MLBASE", "base"
        ),
        "ali_both": lambda: os.environ.update(
            {"DAFS_TPU_ALIFOLD_SPECIAL_HP": "0", "DAFS_TPU_ALIFOLD_MLBASE": "base"}
        ),
        "nosp_mmMd5": lambda: (
            os.environ.__setitem__("DAFS_TPU_ALIFOLD_SPECIAL_HP", "0"),
            ep.set_param_overrides({"mismatchM": d5}),
        ),
        "nosp_tau110": lambda: (
            os.environ.__setitem__("DAFS_TPU_ALIFOLD_SPECIAL_HP", "0"),
            ep.set_param_overrides({"terminal_au": 110}),
        ),
        "nosp_mmMz": lambda: (
            os.environ.__setitem__("DAFS_TPU_ALIFOLD_SPECIAL_HP", "0"),
            ep.set_param_overrides(
                {"mismatchM": np.zeros_like(ep.MISMATCH_EXT_T04)}
            ),
        ),
        # 1xN / 2x3 interior mismatches replaced by the full interior
        # mismatch table (the other plausible Vienna construction)
        "mm1n_mmI": lambda: ep.set_param_overrides(
            {"mismatch1nI": t["mismatchI37"]}
        ),
        "mm23_mmI": lambda: ep.set_param_overrides(
            {"mismatch23I": t["mismatchI37"]}
        ),
        # 1xN closure penalty at 50 (TerminalAU-equal) instead of 70
        "mm1n_50": lambda: ep.set_param_overrides(
            {"mismatch1nI": np.where(ep.MISMATCH_1NI_T04 != 0, 50, 0).astype(np.int32)}
        ),
        # mismatchM/Ext clamped at 0 per dangle before summing (an alternative
        # parameter-file construction: min(d5,0)+min(d3,0) == plain sum here,
        # so instead try clamping the SUM at each dangle's floor)
        "mmM_min_d": lambda: ep.set_param_overrides(
            {"mismatchM": np.minimum(
                np.broadcast_to(ep._T04_DANGLE5[:, :, None], (8, 5, 5)),
                np.broadcast_to(ep._T04_DANGLE3[:, None, :], (8, 5, 5)),
            ).astype(np.int32)}
        ),
    }


def _mmM_alpha(alpha: float):
    """mismatchM = d5 + alpha*d3 (alpha=1 is the base reconstruction;
    alpha=0 is the d5-only probe that fixed node 12 but broke 11)."""
    from dafs_tpu.ops import energy_params as ep

    m = (
        ep._T04_DANGLE5[:, :, None].astype(np.float64)
        + alpha * ep._T04_DANGLE3[:, None, :].astype(np.float64)
    )
    return np.round(m).astype(np.int32)


def grid_variants():
    from dafs_tpu.ops import energy_params as ep

    out = {}
    for tau in (70, 90, 100, 105):
        out[f"tau_{tau}"] = (
            lambda tau=tau: ep.set_param_overrides({"terminal_au": tau})
        )
    for a in (0.25, 0.5, 0.75):
        out[f"mmM_a{a}"] = (
            lambda a=a: ep.set_param_overrides({"mismatchM": _mmM_alpha(a)})
        )
    for tau in (56, 70, 85, 100, 115):
        for a in (0.3, 0.4, 0.5, 0.6, 0.75, 1.0):
            out[f"g_t{tau}_a{a}"] = (
                lambda tau=tau, a=a: ep.set_param_overrides(
                    {"terminal_au": tau, "mismatchM": _mmM_alpha(a)}
                )
            )
    return out


if __name__ == "__main__":
    main()
