#!/usr/bin/env python
"""Summarize the round-4 on-chip queue logs into a markdown table.

Reads the $LOG dirs written by scripts/r4_onchip.sh / r4_filesource.sh /
r4_quality.sh and extracts, per leg: the bench JSON line (bench_* legs),
the steady-state dispatch cadence (train legs), and eval metrics — so the
BASELINE.md write-up starts from machine-parsed numbers, not eyeballed
tails. Pure host-side text parsing; never touches jax.

Usage: python scripts/r4_summarize.py [--onchip DIR] [--fs DIR] [--q DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys


def last_json_line(path: str):
    """Return the last parseable JSON object line in the file, or None."""
    try:
        with open(path, "r", errors="replace") as f:
            lines = f.readlines()
    except OSError:
        return None
    for line in reversed(lines):
        line = line.strip()
        if not (line.startswith("{") and line.endswith("}")):
            continue
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    return None


def last_cadence(path: str):
    """Return (frames_per_sec, ms_per_dispatch, label) from the trainer's
    last dispatch-cadence line (train/loop.py:271), or None."""
    pat = re.compile(
        r"p50 dispatch cadence\s+([0-9.]+)\s*ms.*?~([0-9,.]+)\s*frames/sec/chip"
    )
    best = None
    try:
        with open(path, "r", errors="replace") as f:
            for line in f:
                m = pat.search(line)
                if m:
                    best = (
                        float(m.group(2).replace(",", "")),
                        float(m.group(1)),
                        line.strip()[-160:],
                    )
    except OSError:
        return None
    return best


def scalar_tail(path: str, key: str, n: int = 3):
    """Last n values of a JSONL/train-log scalar named `key`."""
    vals = []
    pat = re.compile(
        r'"%s"\s*:\s*(-?[0-9.]+(?:[eE][-+]?[0-9]+)?)' % re.escape(key)
    )
    try:
        with open(path, "r", errors="replace") as f:
            for line in f:
                m = pat.search(line)
                if m:
                    try:
                        vals.append(float(m.group(1)))
                    except ValueError:
                        pass
    except OSError:
        return []
    return vals[-n:]


def fmt(v):
    if v is None:
        return "—"
    if isinstance(v, float):
        return f"{v:,.4g}" if abs(v) < 1000 else f"{v:,.0f}"
    return str(v)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--onchip", default="/tmp/r4_onchip")
    ap.add_argument("--fs", default="/tmp/r4_filesource")
    ap.add_argument("--q", default="/tmp/r4_quality")
    args = ap.parse_args(argv)

    print("## bench legs (JSON lines)\n")
    print("| leg | metric | value | unit | vs_baseline | extras |")
    print("|---|---|---|---|---|---|")
    if os.path.isdir(args.onchip):
        for name in sorted(os.listdir(args.onchip)):
            if not name.endswith(".log"):
                continue
            j = last_json_line(os.path.join(args.onchip, name))
            if j is None:
                print(f"| {name[:-4]} | — | — | — | — | no JSON line |")
                continue
            extras = {
                k: v
                for k, v in j.items()
                if k
                not in ("metric", "value", "unit", "vs_baseline", "presets")
            }
            if "presets" in j:
                extras["presets"] = {
                    k: round(v.get("frames_per_sec_per_chip", 0), 1)
                    if isinstance(v, dict)
                    else v
                    for k, v in j["presets"].items()
                }
            print(
                f"| {name[:-4]} | {fmt(j.get('metric'))} | {fmt(j.get('value'))}"
                f" | {fmt(j.get('unit'))} | {fmt(j.get('vs_baseline'))}"
                f" | {json.dumps(extras, default=str)[:200]} |"
            )

    print("\n## file-source cadences\n")
    print("| run | f/s | ms/dispatch | last line |")
    print("|---|---|---|---|")
    if os.path.isdir(args.fs):
        for name in sorted(os.listdir(args.fs)):
            if not name.endswith(".log"):
                continue
            c = last_cadence(os.path.join(args.fs, name))
            if c is None:
                print(f"| {name[:-4]} | — | — | no cadence line |")
            else:
                print(f"| {name[:-4]} | {c[0]:,.0f} | {c[1]:.3f} | `{c[2]}` |")

    print("\n## quality runs\n")
    if os.path.isdir(args.q):
        for name, keys in (
            ("c2_train.log", ("eval_psnr", "eval_psnr_ema", "g_loss", "d_loss")),
            # cli.py eval prints evaluate()'s eval_-prefixed keys
            # (train/sample.py) — NOT bare psnr/ssim.
            ("c2_eval.log", ("eval_psnr", "eval_ssim", "eval_l1", "eval_l2")),
            ("c5_train.log", ("g_loss", "d_loss", "recon")),
        ):
            path = os.path.join(args.q, name)
            if not os.path.exists(path):
                continue
            row = {k: scalar_tail(path, k) for k in keys}
            row = {k: v for k, v in row.items() if v}
            print(f"- `{name}`: {json.dumps(row)}")
            j = last_json_line(path)
            if j:
                print(f"  last JSON: {json.dumps(j, default=str)[:300]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
