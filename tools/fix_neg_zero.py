"""One-off codemod: normalize IEEE -0.0 out of every rounded oracle column.

DuckDB's round() preserves the sign of a zero rounded from a tiny negative
(-1e-9 -> -0.0) while Spark's returns +0.0; the driver hashes raw bytes, so
the two disagree even though ``==`` says equal (the r2 `kinematics` red row).
``x + 0.0`` maps -0.0 -> +0.0 and is exact for every other value, in IEEE
round-to-nearest, in Spark, DuckDB, and Python alike.

Transforms:
  __spark_entry__.py : F.round(   -> _RND(            (helper adds +0.0)
                       round(...) -> (round(...) + 0e0)   [SQL oracles]
  tools/gen_golden.py: round(...) -> (round(...) + 0e0)   [Python builtin]

Run once, review the diff, commit.  Idempotent-ish: skips already-wrapped
`(round(...) + 0e0)` occurrences.
"""

from __future__ import annotations

import re
import sys


def wrap_rounds(src: str) -> tuple[str, int]:
    """Wrap every bare round( ... ) call as (round( ... ) + 0e0)."""
    out = []
    i = 0
    n = 0
    pat = re.compile(r"round\(")
    while True:
        m = pat.search(src, i)
        if not m:
            out.append(src[i:])
            break
        s = m.start()
        # skip F.round / _RND-internal / identifiers ending in 'round'
        prev = src[s - 1] if s > 0 else ""
        if prev.isalnum() or prev in "._":
            out.append(src[i:m.end()])
            i = m.end()
            continue
        # find matching close paren
        depth = 0
        j = m.end() - 1
        while j < len(src):
            if src[j] == "(":
                depth += 1
            elif src[j] == ")":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        call = src[s:j + 1]
        if src[j + 1:j + 7] == " + 0e0":  # already wrapped
            out.append(src[i:j + 1])
            i = j + 1
            continue
        out.append(src[i:s])
        out.append("(" + call + " + 0e0)")
        n += 1
        i = j + 1
    return "".join(out), n


def main() -> None:
    for path, rename in (("__spark_entry__.py", True), ("tools/gen_golden.py", False)):
        src = open(path).read()
        nr = 0
        if rename:
            nr = src.count("F.round(")
            src = src.replace("F.round(", "_RND(")
        src, nw = wrap_rounds(src)
        open(path, "w").write(src)
        print(f"{path}: {nr} F.round->_RND, {nw} SQL/py rounds wrapped")


if __name__ == "__main__":
    sys.exit(main())
