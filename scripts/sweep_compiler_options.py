"""Sweep XLA compiler options through the bench and rank the results.

Each candidate option spec (a ``--compiler-options`` string, i.e.
``key=value[,key=value...]``) runs ``bench.py`` in a fresh subprocess so
compilations never leak between configurations, and the headline JSON
line is collected.  A baseline (no options) runs first; the final table
is sorted by throughput with the delta vs that baseline.

Usage:
    python scripts/sweep_compiler_options.py --iters 4 \
        xla_tpu_scoped_vmem_limit_kib=32768 \
        "xla_tpu_rwb_fusion=false,xla_tpu_dot_dot_fusion=true"
    python scripts/sweep_compiler_options.py --from-file opts.txt \
        --bench-arg=--no-beams --out sweep.jsonl

Options reach the TPU compiler via the per-compile channel
(qaig_tpu/utils/compiler_options.py) — the only one that works through a
remote-backend relay; unknown option names fail that run with XLA's own
error and are reported as such rather than aborting the sweep.
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(option_spec, iters, bench_args, timeout):
    cmd = [sys.executable, os.path.join(REPO, "bench.py"),
           "--iters", str(iters)] + list(bench_args)
    if option_spec:
        cmd += ["--compiler-options", option_spec]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=timeout, cwd=REPO)
    except subprocess.TimeoutExpired:
        return {"error": "timeout"}
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and '"metric"' in line:
            return json.loads(line)
    tail = (proc.stdout + proc.stderr).strip().splitlines()
    return {"error": tail[-1][:200] if tail else f"rc={proc.returncode}"}


def main():
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("specs", nargs="*",
                        help="option specs (key=value[,key=value...])")
    parser.add_argument("--from-file", default=None,
                        help="file with one option spec per line "
                             "(# comments ok)")
    parser.add_argument("--iters", type=int, default=4)
    parser.add_argument("--timeout", type=float, default=600.0,
                        help="per-run timeout (s)")
    parser.add_argument("--bench-arg", action="append", default=[],
                        help="extra bench.py arg (repeatable), e.g. "
                             "--bench-arg=--no-beams")
    parser.add_argument("--out", default=None,
                        help="append every result as JSONL here")
    args = parser.parse_args()

    specs = list(args.specs)
    if args.from_file:
        with open(args.from_file) as f:
            specs += [ln.strip() for ln in f
                      if ln.strip() and not ln.lstrip().startswith("#")]
    if not specs:
        parser.error("no option specs given")

    rows = []
    for spec in [None] + specs:  # None = baseline
        label = spec or "(baseline)"
        print(f"== {label}", flush=True)
        res = run_bench(spec, args.iters, args.bench_arg, args.timeout)
        row = {"options": label, **res}
        rows.append(row)
        if args.out:
            with open(args.out, "a") as f:
                f.write(json.dumps(row) + "\n")
        if "error" in res:
            print(f"   ERROR: {res['error']}", flush=True)
        else:
            print(f"   {res['value']} {res['unit']} "
                  f"(iter {res.get('iter_time_mean_s')}s "
                  f"±{res.get('iter_time_std_s')})", flush=True)

    base = next((r for r in rows if r["options"] == "(baseline)"
                 and "value" in r), None)
    print("\n== ranked ==")
    ok = sorted((r for r in rows if "value" in r),
                key=lambda r: -r["value"])
    for r in ok:
        delta = ""
        if base and r is not base:
            delta = f"  ({(r['value'] / base['value'] - 1) * 100:+.1f}%)"
        print(f"{r['value']:>9.2f}  {r['options']}{delta}")
    for r in rows:
        if "value" not in r:
            print(f"   FAILED  {r['options']}: {r['error']}")


if __name__ == "__main__":
    main()
