"""Generate .ipynb tutorials from the markdown sources.

The reference ships tutorials as notebooks (reference tutorials/*.ipynb);
this framework's canonical tutorial source is markdown (testable by
tests/test_tutorials.py without a notebook runtime). This script derives
the notebook form from the SAME source — markdown prose becomes markdown
cells, ```python fences become code cells — so the two can never drift.

    python scripts/build_notebooks.py        # writes docs/tutorials/*.ipynb
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
TUTORIALS = ROOT / "docs" / "tutorials"


def md_to_cells(text: str):
    cells = []
    buf: list[str] = []
    in_code = False
    code_lang = ""

    def flush_md():
        chunk = "\n".join(buf).strip("\n")
        if chunk.strip():
            cells.append({"cell_type": "markdown", "metadata": {},
                          "source": chunk.splitlines(keepends=True)})
        buf.clear()

    def flush_code():
        chunk = "\n".join(buf).rstrip("\n")
        if chunk.strip():
            cells.append({"cell_type": "code", "metadata": {},
                          "execution_count": None, "outputs": [],
                          "source": chunk.splitlines(keepends=True)})
        buf.clear()

    for line in text.splitlines():
        if line.startswith("```"):
            if in_code:
                if code_lang == "python":
                    flush_code()
                else:
                    # non-python fences stay as markdown (shell snippets)
                    buf.insert(0, f"```{code_lang}")
                    buf.append("```")
                    flush_md()
                in_code = False
            else:
                flush_md()
                in_code = True
                code_lang = line[3:].strip()
            continue
        buf.append(line)
    if in_code:
        flush_code()
    else:
        flush_md()
    return cells


def main() -> int:
    n = 0
    for md in sorted(TUTORIALS.glob("*.md")):
        nb = {
            "nbformat": 4,
            "nbformat_minor": 5,
            "metadata": {
                "kernelspec": {"display_name": "Python 3",
                               "language": "python", "name": "python3"},
                "language_info": {"name": "python"},
            },
            "cells": md_to_cells(md.read_text()),
        }
        out = md.with_suffix(".ipynb")
        out.write_text(json.dumps(nb, indent=1))
        print(f"wrote {out.name} ({len(nb['cells'])} cells)")
        n += 1
    return 0 if n else 1


if __name__ == "__main__":
    sys.exit(main())
