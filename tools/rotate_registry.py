#!/usr/bin/env python3
"""Reorder __spark_entry__.queries() staleness-first.

The driver's CORRECTNESS gate only checks the FIRST 50 registry entries each
round, so queries drift stale unless rotated. This tool rewrites the dict body
ordered by last driver-gated round ascending (queries whose latest row is a
FAIL lead their round), preserving relative order within a round. Run from the
repo root after each round's CORRECTNESS_r{N}.json lands:

    python tools/rotate_registry.py          # rewrite in place
    python tools/rotate_registry.py --check  # print the ordering, no write
"""
import glob
import json
import re
import sys

REGISTRY = "__spark_entry__.py"

DOC = """    # Staleness-first rotation (VERDICT r9 item 1): the driver gates the
    # FIRST 50 entries each round. Ordered by last driver-gated round
    # ascending (never-passed queries lead their round) so no entry's latest
    # driver row goes stale. Regenerate each round with
    # tools/rotate_registry.py from the CORRECTNESS_r0*.json history.
    return {
"""


def _regate(src: str) -> dict[str, int]:
    """Parse the module-level REGATE marker dict (gate-semantics changes
    that void older driver rows) without importing pyspark."""
    m = re.search(r"^REGATE: dict\[str, int\] = \{(.*?)^\}", src, re.S | re.M)
    if m is None:
        return {}
    return {
        k: int(r)
        for k, r in re.findall(r'"([a-z0-9_]+)": (\d+),', m.group(1))
    }


def main() -> int:
    last: dict[str, int] = {}
    passed: dict[str, bool] = {}
    for f in sorted(glob.glob("CORRECTNESS_r*.json")):
        r = int(re.search(r"r(\d+)", f).group(1))
        for k, v in json.load(open(f)).items():
            last[k] = r
            passed[k] = bool(v.get("hash_match") or v.get("rows_match"))

    src = open(REGISTRY).read()
    # a gate whose semantics changed after round R is unproven by rows <= R
    for k, r in _regate(src).items():
        if last.get(k, 0) <= r:
            last.pop(k, None)
            passed.pop(k, None)
    m = re.search(
        r"(def queries\(\) -> dict\[str, Callable\[\[SparkSession, str\], "
        r"DataFrame\]\]:\n)(.*?\n    return \{\n)(.*?)(\n    \}\n)",
        src,
        re.S,
    )
    if m is None:
        print(
            "rotate_registry: could not locate queries() return dict in "
            f"{REGISTRY} — function layout changed; update the pattern",
            file=sys.stderr,
        )
        return 1
    # only the dict entries are rewritten; any preamble between the def
    # line and `return {` (docstring, comments, code) is preserved
    # verbatim except the rotation comment block, which is refreshed
    preamble = m.group(2)
    stripped = re.sub(
        r"(?:    # Staleness-first rotation.*?\n)?    return \{\n$",
        "",
        preamble,
        flags=re.S,
    )
    entries = re.findall(r'"([a-z0-9_]+)": (q_[a-z0-9_]+),', m.group(3))
    order = {k: i for i, (k, _) in enumerate(entries)}
    entries.sort(
        key=lambda e: (last.get(e[0], 0), passed.get(e[0], False), order[e[0]])
    )

    if "--check" in sys.argv:
        for k, _ in entries:
            print(f"{last.get(k, 0):>2} {'pass' if passed.get(k) else 'FAIL/new'} {k}")
        return 0

    newbody = (
        stripped
        + DOC
        + "".join(f'        "{k}": {fn},\n' for k, fn in entries)
        + "    }\n"
    )
    open(REGISTRY, "w").write(src[: m.start(2)] + newbody + src[m.end(4) :])
    print(f"rotated {len(entries)} entries; window head: "
          f"{[k for k, _ in entries[:5]]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
