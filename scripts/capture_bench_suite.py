"""Capture every benchmark mode into one JSON, relay-proof and resumable.

The axon TPU relay flickers (r3 lost its whole BENCH artifact to it); when
a window opens, this script milks it: each mode runs as a fresh
subprocess (`bench.py` BENCH_INNER=1) with a hard timeout, results are
flushed to --out after EVERY mode, and already-captured modes are skipped
on re-run — so repeated invocations converge on a full table even if the
relay dies between modes.

Usage (real chip) — /root/.axon_site MUST stay on PYTHONPATH (its
sitecustomize registers the axon TPU backend; dropping it makes every
mode die with "Backend 'axon' is not in the list of known backends"):
    PYTHONPATH=/root/.axon_site:/root/repo python scripts/capture_bench_suite.py \
        --out BENCH_SUITE_r04.json
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
AXON_SITE = "/root/.axon_site"


def build_pythonpath(current):
    """Child PYTHONPATH with the repo AND the axon site enforced in code.

    r4 lost three A/B modes to a caller-side PYTHONPATH that dropped
    /root/.axon_site (its sitecustomize registers the axon TPU backend);
    the modes were committed as error entries. Enforce it here instead of
    relying on the usage string (ADVICE r4).
    """
    parts = [p for p in (current or "").split(os.pathsep) if p]
    if os.path.isdir(AXON_SITE) and AXON_SITE not in parts:
        parts.insert(0, AXON_SITE)
    if REPO not in parts:
        parts.append(REPO)
    return os.pathsep.join(parts)

# (name, env overrides). Ordered by headline importance so a short relay
# window captures the most load-bearing numbers first.
MODES = [
    ("inference_int8_static_reforder", {"BENCH_QUANT": "int8_static"}),
    ("inference_int8_static_decpre",
     {"BENCH_QUANT": "int8_static", "BENCH_DECODER": "pre"}),
    ("train_vgg19_ae", {"BENCH_MODE": "train"}),
    ("train_flagship", {"BENCH_MODE": "train_flagship"}),
    ("inference_bf16_reforder", {"BENCH_QUANT": "none"}),
    # The r3/r4 A/B lever modes (quant_attn=xla/1, fuse_ln=off) are gone:
    # the r5 latency-cancelled campaign measured all of them LOSING to the
    # defaults at the flagship shape (AB_DECPRE_r05.json ab_table) — the
    # knobs stay available through the BENCH_* env vars if ever needed.
]


def last_json_line(text):
    for line in reversed((text or "").strip().splitlines()):
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            try:
                obj = json.loads(line)
            except json.JSONDecodeError:
                continue
            if isinstance(obj, dict) and "metric" in obj:
                return obj
    return None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, default="/tmp/bench_suite.json")
    p.add_argument("--timeout", type=float, default=1800.0,
                   help="hard per-mode subprocess timeout (s)")
    p.add_argument("--only", type=str, default=None,
                   help="comma-separated mode-name substrings to run")
    p.add_argument("--redo", action="store_true",
                   help="re-run modes already present in --out")
    args = p.parse_args()

    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)

    for name, env_over in MODES:
        if args.only and not any(s in name for s in args.only.split(",")):
            continue
        if not args.redo and results.get(name, {}).get("value"):
            print(f"[skip] {name}: already captured "
                  f"{results[name]['value']}", flush=True)
            continue
        env = dict(os.environ)
        env.update(env_over)
        env["BENCH_INNER"] = "1"  # bypass bench.py's own orchestrator
        env["PYTHONPATH"] = build_pythonpath(env.get("PYTHONPATH"))
        t0 = time.time()
        print(f"[run ] {name} ...", flush=True)
        try:
            res = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py")],
                capture_output=True, text=True, timeout=args.timeout, env=env,
            )
            parsed = last_json_line(res.stdout)
            if parsed is None:
                tail = (res.stderr or res.stdout).strip().splitlines()[-4:]
                parsed = {"error": f"rc={res.returncode}: " + " | ".join(tail)}
        except subprocess.TimeoutExpired:
            parsed = {"error": f"timeout after {args.timeout:.0f}s"}
        parsed["wall_s"] = round(time.time() - t0, 1)
        # Per-mode capture metadata so cross-mode comparisons within one
        # artifact can be audited for same-window apples-to-apples
        # (ADVICE r4): entries captured under different relay sessions or
        # environments are distinguishable.
        parsed["captured_at"] = time.strftime(
            "%Y-%m-%dT%H:%M:%SZ", time.gmtime())
        parsed["capture_env"] = {
            "pythonpath": env["PYTHONPATH"],
            "jax_platforms": env.get("JAX_PLATFORMS", ""),
            "suite_pid": os.getpid(),
        }
        results[name] = parsed
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"[done] {name}: "
              f"{parsed.get('value', parsed.get('error'))} "
              f"({parsed['wall_s']}s)", flush=True)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
