"""dafs-compatible command line interface (src/dafs.cpp:1603-1779).

Usage: python -m dafs_tpu.cli [options] FILE   (or the `dafs-tpu` entry point)
"""

from __future__ import annotations

import argparse
import os
import sys


VERSION = "0.0.4"  # reference parity: src/CMakeLists.txt:12 (DAFS v0.0.4)


def build_parser() -> argparse.ArgumentParser:
    # option surface + help text mirror src/dafs.cpp:1607-1643 (cxxopts
    # groups "", "Aligning", "Folding"; --help/--version at :1650-1661)
    p = argparse.ArgumentParser(
        prog="dafs-tpu",
        description="DAFS: dual decomposition for simultaneous aligning "
        "and folding RNA sequences (TPU-native rebuild).",
    )
    p.add_argument("--version", action="version",
                   version=f"DAFS version {VERSION}")
    p.add_argument("input", metavar="FILE", help="Input file")
    p.add_argument("-r", "--refinement", type=int, default=0, metavar="N",
                   help="The number of iteration of the iterative refinment")
    p.add_argument("-w", "--weight", type=float, default=4.0,
                   help="Weight of the expected accuracy score for secondary "
                        "structures")
    p.add_argument("--eta", type=float, default=0.5,
                   help="Initial step width for the subgradient optimization")
    p.add_argument("-m", "--max-iter", type=int, default=600, metavar="T",
                   help="The maximum number of iteration of the subgradient "
                        "optimization")
    p.add_argument("--dd-update", default="subgradient",
                   choices=["subgradient", "adagrad", "adam"],
                   help="multiplier update rule (reference's compile-time "
                        "ADAGRAD/ADAM variants, src/dafs.cpp:67-69,984-1004)")
    p.add_argument("-f", "--fourway-pct", type=float, default=0.0,
                   help="Weight of four-way PCT")
    p.add_argument("-v", "--verbose", type=int, default=0,
                   help="The level of verbose outputs")
    ga = p.add_argument_group("Aligning")
    ga.add_argument("-a", "--align-model", default="ProbCons",
                    choices=["ProbCons", "CONTRAlign"],
                    help="Alignment model for calculating matching "
                         "probabilities")
    ga.add_argument("-p", "--align-pct", type=float, default=0.25,
                    help="Weight of PCT for matching probabilities")
    ga.add_argument("-u", "--align-th", type=float, default=0.01,
                    help="Threshold for matching probabilities")
    ga.add_argument("--align-aux", metavar="FILENAME",
                    help="Load matching probability matrices from FILENAME")
    gf = p.add_argument_group("Folding")
    gf.add_argument("-s", "--fold-model", default="Boltzmann",
                    choices=["Boltzmann", "Vienna", "CONTRAfold"],
                    help="Folding model for calculating base-pairing "
                         "probabilities (note: without -P, 'Vienna' reuses "
                         "the built-in BL* base tables — pass -P "
                         "rna_turner2004.par for the exact Turner-2004 "
                         "model)")
    gf.add_argument("--fold-decoder", default="Nussinov",
                    choices=["Nussinov", "IPknot"],
                    help="Decoder for common secondary structure prediction")
    gf.add_argument("-q", "--fold-pct", type=float, default=0.25,
                    help="Weight of PCT for base-pairing probabilities")
    gf.add_argument("-t", "--fold-th", type=str, default=None,
                    help="Threshold for base-pairing probabilities")
    gf.add_argument("-g", "--gamma", type=str, default=None,
                    help="Specify the threshold for base-pairing "
                         "probabilities by 1/(gamma+1)")
    gf.add_argument("--no-alifold", action="store_true",
                    help="No use of RNAalifold for calculating base-pairing "
                         "probabilities")
    gf.add_argument("-T", "--fold-th1", type=str, default=None,
                    help="Threshold for base-pairing probabilities of the "
                         "conclusive common secondary structures")
    gf.add_argument("-G", "--gamma1", type=str, default=None,
                    help="Specify the threshold for base-pairing "
                         "probabilities of the conclusive common secondary "
                         "structures by 1/(gamma+1)")
    gf.add_argument("--ipknot", action="store_true",
                    help="Set optimized parameters for IPknot decoding "
                         "(--fold-decoder=IPknot -g4,8 -G2,4 --bp-update1)")
    gf.add_argument("--bp-update", action="store_true",
                    help="Use the iterative update of BPs")
    gf.add_argument("--bp-update1", action="store_true",
                    help="Use the iterative update of BPs for the final "
                         "prediction")
    gf.add_argument("--fold-aux", metavar="FILENAME",
                    help="Load base-pairing probability matrices from "
                         "FILENAME")
    p.add_argument("--save-align-aux", metavar="FILENAME",
                   help="dump match posteriors (reloadable via --align-aux)")
    p.add_argument("--profile", metavar="DIR", default=None,
                   help="capture a jax.profiler trace of the run into DIR "
                        "(view with TensorBoard / xprof); note: device-side "
                        "traces require a locally attached accelerator")
    p.add_argument("--save-fold-aux", metavar="FILENAME",
                   help="dump base-pair posteriors (reloadable via --fold-aux)")
    p.add_argument("-P", "--param-file", metavar="FILE", default=None,
                   help="ViennaRNA v2.0 energy parameter file; every table it"
                        " contains overrides the built-in set (the RNAfold -P"
                        " equivalent — e.g. rna_turner2004.par gives the exact"
                        " Turner-2004 model for -s Vienna)")
    return p


def _parse_floats(s):
    return [float(x) for x in s.split(",")]


def options_from_args(args):
    from dafs_tpu import pipeline

    # threshold resolution (src/dafs.cpp:1709-1750)
    if args.fold_th is not None:
        th_s = _parse_floats(args.fold_th)
    elif args.gamma is not None:
        th_s = [1.0 / (1.0 + g) for g in _parse_floats(args.gamma)]
    elif args.ipknot:
        th_s = [1.0 / (1.0 + 4.0), 1.0 / (1.0 + 8.0)]
    else:
        th_s = [0.2]

    if args.fold_th1 is not None:
        th_s1 = _parse_floats(args.fold_th1)
    elif args.gamma1 is not None:
        th_s1 = [1.0 / (1.0 + g) for g in _parse_floats(args.gamma1)]
    elif args.ipknot:
        th_s1 = [1.0 / (1.0 + 2.0), 1.0 / (1.0 + 4.0)]
    else:
        th_s1 = th_s

    fold_decoder = "IPknot" if (args.ipknot or args.fold_decoder == "IPknot") else "Nussinov"
    return pipeline.Options(
        w=args.weight,
        eta0=args.eta,
        t_max=args.max_iter,
        n_refinement=args.refinement,
        w_pct_a=args.align_pct,
        w_pct_s=args.fold_pct,
        w_pct_f=args.fourway_pct,
        th_a=args.align_th,
        th_s=tuple(th_s),
        th_s1=tuple(th_s1),
        use_alifold=not args.no_alifold,
        use_bp_update=args.bp_update,
        # --bp-update1 XORs with --ipknot (src/dafs.cpp:1767)
        use_bp_update1=bool(args.bp_update1) ^ bool(args.ipknot),
        fold_decoder=fold_decoder,
        verbose=args.verbose,
        save_align_aux=args.save_align_aux,
        save_fold_aux=args.save_fold_aux,
        dd_update=args.dd_update,
    )


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if not os.path.exists(args.input):
        print(f"{args.input}: No such file or directory", file=sys.stderr)
        return 1
    if args.param_file:
        from dafs_tpu.ops.param_file import apply_param_file

        apply_param_file(args.param_file)

    # heavy imports only after successful argument parsing
    import jax

    # persistent compile cache: the kernels are re-jitted per (length-bucket,
    # group-size) combination; caching the executables across processes turns
    # repeat runs from minutes of XLA compilation into seconds.  The dir is
    # fingerprinted by host CPU features (aot.compile_cache_dir): XLA:CPU AOT
    # artifacts SIGILL/segfault when loaded on a different machine.
    from dafs_tpu.utils.aot import setup_compile_cache

    setup_compile_cache()
    # NOTE: leave jax_persistent_cache_min_compile_time_secs at its default
    # (1s).  Setting it to 0 makes the cache serialize EVERY executable; on
    # the TPU backend, executable serialization of the big DP kernels is
    # pathologically slow (measured: first fold call 444s vs 2.3s, 2026-08).
    # Sub-second compiles are cheap to redo; caching them costs minutes.

    # keep the CPU backend available alongside the accelerator: the alifold
    # *oracle* path (fast=False, tests/ablation only) is pinned to CPU
    # because its gathers are pathological on TPU (ops/alifold.py); the
    # default fast kernel runs on the accelerator.
    try:
        plats = jax.config.jax_platforms
        if plats and "cpu" not in plats:
            jax.config.update("jax_platforms", plats + ",cpu")
    except Exception:
        pass

    from dafs_tpu import pipeline
    from dafs_tpu.fasta import load_fasta
    from dafs_tpu.models import align_models, fold_models
    from dafs_tpu.utils.log import set_verbosity

    set_verbosity(args.verbose)
    opts = options_from_args(args)

    if args.align_aux:
        a_model = align_models.AUXAlign(args.align_aux, args.align_th)
    elif args.align_model == "CONTRAlign":
        a_model = align_models.CONTRAlign(args.align_th)
    else:
        a_model = align_models.ProbCons(args.align_th)

    from dafs_tpu.typedefs import CUTOFF

    if args.fold_aux:
        s_model = fold_models.AUXFold(args.fold_aux, CUTOFF)
    elif args.fold_model == "Boltzmann":
        s_model = fold_models.RNAfold(True, CUTOFF)
    elif args.fold_model == "Vienna":
        s_model = fold_models.RNAfold(False, CUTOFF)
    else:
        s_model = fold_models.CONTRAfold(CUTOFF)

    # The final decode always mixes in alifold regardless of --no-alifold
    # (use_alifold1_ is unconditionally true, src/dafs.cpp:81-82,1696), so the
    # model is constructed unconditionally; --no-alifold only gates merge steps.
    try:
        from dafs_tpu.ops import alifold as alifold_ops

        alifold_model = alifold_ops.Alifold(0.0, bl=args.fold_model == "Boltzmann")
    except ImportError:
        alifold_model = None

    fa = load_fasta(args.input)
    d = pipeline.Dafs(a_model, s_model, opts, alifold_model=alifold_model)
    if args.profile:
        with jax.profiler.trace(args.profile):
            out = d.run(fa)
    else:
        out = d.run(fa)
    sys.stdout.write(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
