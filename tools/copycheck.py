"""Normalized-line overlap check against the reference repo.

Replicates the judge's round-1 method (VERDICT.md "Copy-paste findings"):
for each repo .py file, normalize lines (strip ALL whitespace, drop
comment-only lines and trailing comments conservatively, keep lines with
>= 8 chars after normalization) and report the fraction of the repo
file's normalized lines that appear verbatim in each candidate reference
file.  A file is flagged when its best overlap is > 0.40.

Usage:
    python tools/copycheck.py [--threshold 0.4] [paths...]
"""

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference")


def normalize_lines(text: str):
    out = []
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        # Drop trailing comments when the '#' is not inside a string literal
        # (conservative: only cut if no quote appears before the '#').
        idx = line.find("#")
        if idx > 0 and "'" not in line[:idx] and '"' not in line[:idx]:
            line = line[:idx]
        line = "".join(line.split())
        if len(line) >= 8:
            out.append(line)
    return out


def collect_ref_files():
    files = {}
    for p in REF.rglob("*.py"):
        try:
            lines = normalize_lines(p.read_text(errors="ignore"))
        except OSError:
            continue
        if lines:
            files[p] = (set(lines), len(lines))
    return files


def best_overlap(repo_lines, ref_files):
    repo_set = set(repo_lines)
    n = len(repo_set)
    if n == 0:
        return 0.0, None, 0
    best = (0.0, None, 0)
    for p, (ref_set, _) in ref_files.items():
        hits = len(repo_set & ref_set)
        frac = hits / n
        if frac > best[0]:
            best = (frac, p, hits)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("paths", nargs="*", help="repo files to check (default: all vkit_tpu)")
    ap.add_argument("--threshold", type=float, default=0.40)
    ap.add_argument("--all", action="store_true", help="print every file, not just flagged")
    args = ap.parse_args()

    if args.paths:
        targets = [Path(p).resolve() for p in args.paths]
    else:
        targets = sorted((REPO / "vkit_tpu").rglob("*.py"))

    ref_files = collect_ref_files()
    flagged = 0
    rows = []
    for t in targets:
        if "__pycache__" in str(t):
            continue
        lines = normalize_lines(t.read_text(errors="ignore"))
        if len(lines) < 20:  # trivial files (registries, __init__) skip
            continue
        frac, ref, hits = best_overlap(lines, ref_files)
        rows.append((frac, t, ref, hits, len(set(lines))))

    rows.sort(reverse=True, key=lambda r: r[0])
    for frac, t, ref, hits, n in rows:
        if frac > args.threshold or args.all:
            mark = "FLAG" if frac > args.threshold else "  ok"
            refname = str(ref.relative_to(REF)) if ref else "-"
            print(f"{mark} {frac:.2f} ({hits}/{n}) {t.relative_to(REPO)} ~ {refname}")
            if frac > args.threshold:
                flagged += 1
    print(f"\n{flagged} flagged above {args.threshold}")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
