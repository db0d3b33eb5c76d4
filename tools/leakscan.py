#!/usr/bin/env python3
"""Leak scan with EVIDENCE STAMPING (r16-verdict task #6).

Scans every git-tracked file for the seven leak categories the round
driver checks (internal imports/URLs/packages/buckets, Slack links,
API keys, internal env vars) and writes LEAKCHECK.json carrying the
scanned tree's fingerprint — the git tree hash and tracked-file
count — so each round's "0 hits" is independently evidenced against
HEAD rather than being a bare round-number bump.

Usage: python3 tools/leakscan.py [round_number]
Exit 0 = no hits; exit 1 = hits found (listed in the JSON).
"""
import json
import re
import subprocess
import sys

# Categories mirror the driver's LEAKCHECK keys. Patterns target
# non-public tooling/infra references; the repo legitimately names the
# PUBLIC reference repo (ibis-olap-aggregation) and the public oracle
# engine (duckdb), so those never match.
PATTERNS = {
    "internal-import": re.compile(
        r"^\s*(?:import|from)\s+(?:com\.anthropic|anthropic|ai\.anthropic)\b",
        re.M),
    "internal-url": re.compile(
        r"https?://[^\s\"'`]*(?:anthropic\.com|\.corp\.|\.internal\b)"),
    "internal-pkg2": re.compile(
        r"\b(?:claude[-_]cli[-_]internal|anthropics/)"),
    "internal-bucket": re.compile(
        r"\b(?:s3|gs)://[a-z0-9.-]*(?:anthropic|internal|corp)[a-z0-9.-]*"),
    "slack-link": re.compile(
        r"(?:slack\.com/archives|#claude-code-)"),
    "api-key": re.compile(
        r"\bsk-ant-[A-Za-z0-9_-]{8,}"),
    "axon-env": re.compile(
        r"\b(?:ANTHROPIC|CLAUDE)_[A-Z0-9_]*\s*="),
}


def main() -> int:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else -1
    tracked = subprocess.run(
        ["git", "ls-files"], capture_output=True, text=True, check=True
    ).stdout.splitlines()
    # the scanner's own pattern definitions ARE the leak strings —
    # exclude exactly this file. files_tracked keeps the FULL count so
    # the tracked-vs-scanned gap in the evidence exposes the exclusion.
    files = [f for f in tracked if f != "tools/leakscan.py"]
    tree = subprocess.run(
        ["git", "rev-parse", "HEAD^{tree}"], capture_output=True, text=True,
        check=True).stdout.strip()
    head = subprocess.run(
        ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
        check=True).stdout.strip()
    # the scan reads WORKING-TREE contents; the tree hash only
    # evidences the scan when the two agree — record dirtiness so a
    # "0 hits at tree X" claim can't silently cover unscanned content
    dirty = subprocess.run(
        ["git", "status", "--porcelain"], capture_output=True, text=True,
        check=True).stdout.strip() != ""
    hits = {k: [] for k in PATTERNS}
    scanned = 0
    for path in files:
        try:
            with open(path, "rb") as f:
                raw = f.read()
            if b"\x00" in raw[:4096]:  # binary
                continue
            text = raw.decode("utf-8", errors="replace")
        except OSError:
            continue
        scanned += 1
        for cat, pat in PATTERNS.items():
            for m in pat.finditer(text):
                line = text.count("\n", 0, m.start()) + 1
                hits[cat].append(f"{path}:{line}")
    n_hits = sum(len(v) for v in hits.values())
    out = {
        "round": rnd,
        "n_hits": n_hits,
        "hits": hits,
        "evidence": {
            "head": head,
            "tree": tree,
            "tree_is_scanned_content": not dirty,
            "files_tracked": len(tracked),
            "files_scanned": scanned,
            "scanner": "tools/leakscan.py (excluded from its own scan)",
        },
    }
    with open("LEAKCHECK.json", "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps({"n_hits": n_hits, "tree": tree, "dirty": dirty,
                      "files_scanned": scanned}))
    return 1 if n_hits else 0


if __name__ == "__main__":
    sys.exit(main())
