#!/usr/bin/env python3
"""Self-evidencing leak scan (ADVICE r11): the driver's LEAKCHECK.json
carries no commit SHA or timestamp, so nothing in that artifact proves
the scan ran at the round's HEAD rather than being relabeled. This
repo-side scan mirrors the same categories, stamps the scanned HEAD SHA
and a UTC timestamp, and writes LEAKCHECK_local.json — run it before the
round-closing commit so the artifact self-evidences.

Usage: python3 scripts/leakscan.py [repo_root]
"""
import json
import re
import subprocess
import sys
from datetime import datetime, timezone
from pathlib import Path

# import roots that are public/expected in this repo: JVM + Spark + test
# libs + this project for Scala; stdlib + the driver-side analysis deps
# for Python. `s`/`spark` are the SparkSession val in `import
# s.implicits._`. Anything else (a proprietary package root) is a hit.
ALLOWED_IMPORT_ROOTS = {
    "scala", "java", "javax", "org", "graft", "s", "spark", "ds",
    "software",  # software.amazon.awssdk — the PUBLIC AWS SDK root
    "json", "re", "sys", "subprocess", "math", "duckdb", "pyarrow",
    "pandas", "numpy", "datetime", "pathlib", "time", "os",
}
# public hosts: RFC example domains, AWS public endpoints the access-log
# FORMAT itself names, public project sites, and the synthetic fixture
# hosts the d20/d21 queries plant (siteN.example.org, cdn.example.net,
# amazon.com appears in the reference's public sample log lines)
PUBLIC_HOST = re.compile(
    r"^(?:[a-z0-9.-]*\.)?(?:example\.(?:com|org|net)|localhost|127\.0\.0\.1"
    r"|amazonaws\.com|apache\.org|github\.com|duckdb\.org|amazon\.com"
    r"|site[0-9]*|cdn[0-9]*)$", re.I)

CATEGORIES = {
    "internal-import": re.compile(
        r"^\s*import\s+([A-Za-z_][A-Za-z0-9_]*)", re.M),
    "internal-url": re.compile(r"https?://([a-z0-9.-]+)", re.I),
    "slack-link": re.compile(r"slack\.com|app\.slack|#[a-z0-9-]*claude", re.I),
    "api-key": re.compile(
        r"(?:api[_-]?key|secret[_-]?key|aws_secret|token)\s*[:=]\s*['\"][A-Za-z0-9+/]{20,}",
        re.I),
    # internal bucket naming (examplebucket/mybucket/bucket-N and the
    # bare `s3://bucket` doc placeholder are public vocabulary)
    "internal-bucket": re.compile(
        r"s3://(?!examplebucket|example-bucket|mybucket|bucket\b|bucket-)[a-z0-9.-]{3,}",
        re.I),
}


def is_false_positive(cat: str, m: re.Match) -> bool:
    if cat == "internal-import":
        # capitalized root = a member import of a project object
        # (`import TextHash._`), not a package
        return m.group(1)[0].isupper() or m.group(1) in ALLOWED_IMPORT_ROOTS
    if cat == "internal-url":
        return bool(PUBLIC_HOST.match(m.group(1)))
    return False

SCAN_SUFFIXES = {".scala", ".py", ".md", ".sbt", ".json", ".sh"}


def main(root: Path) -> int:
    sha = subprocess.run(["git", "rev-parse", "HEAD"], cwd=root,
                         capture_output=True, text=True).stdout.strip()
    hits = {k: [] for k in CATEGORIES}
    for p in sorted(root.rglob("*")):
        if p.is_dir() or p.suffix not in SCAN_SUFFIXES:
            continue
        rel = p.relative_to(root)
        parts = rel.parts
        if parts[0] in ("target", "spark-warehouse", ".git", "project"):
            continue
        if rel.name == "LEAKCHECK_local.json":
            continue
        try:
            text = p.read_text(errors="replace")
        except OSError:
            continue
        for cat, rx in CATEGORIES.items():
            for m in rx.finditer(text):
                if is_false_positive(cat, m):
                    continue
                line = text.count("\n", 0, m.start()) + 1
                hits[cat].append(f"{rel}:{line}: {m.group(0)[:80]}")
    out = {
        "scanned_head": sha,
        "scanned_at_utc": datetime.now(timezone.utc).isoformat(timespec="seconds"),
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    (root / "LEAKCHECK_local.json").write_text(json.dumps(out, indent=2) + "\n")
    print(f"leakscan: {out['n_hits']} hits at {sha[:12]}")
    return 0 if out["n_hits"] == 0 else 1


if __name__ == "__main__":
    sys.exit(main(Path(sys.argv[1] if len(sys.argv) > 1 else ".")))
