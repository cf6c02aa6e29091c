"""Render a percent-format notebook script (`# %%` cells) to .ipynb JSON.

Keeps the committed notebook artifact (`notebooks/*.ipynb`) in lockstep with
its runnable/testable .py source without a jupytext dependency:

    python scripts/py_to_ipynb.py notebooks/clip_subtitle_viz.py

writes the sibling `.ipynb`. `tests/test_notebook.py` asserts the committed
notebook matches a fresh render.
"""

import argparse
import json
import os


def parse_percent_cells(source: str):
    """Split percent-format source into (cell_type, source_lines) pairs."""
    cells = []
    cell_type, lines = "code", []

    def flush():
        nonlocal lines
        body = lines
        while body and not body[0].strip():
            body = body[1:]
        while body and not body[-1].strip():
            body = body[:-1]
        if body:
            if cell_type == "markdown":
                body = [line[2:] if line.startswith("# ") else
                        ("" if line.strip() == "#" else line)
                        for line in body]
            cells.append((cell_type, body))
        lines = []

    for line in source.splitlines():
        stripped = line.strip()
        if stripped.startswith("# %%"):
            flush()
            cell_type = "markdown" if "[markdown]" in stripped else "code"
        else:
            lines.append(line)
    flush()
    return cells


def render_notebook(py_path: str) -> dict:
    with open(py_path) as file:
        cells = parse_percent_cells(file.read())
    return {
        "cells": [{
            "cell_type": cell_type,
            "metadata": {},
            "source": [line + "\n" for line in body[:-1]] + [body[-1]],
            **({"outputs": [], "execution_count": None}
               if cell_type == "code" else {}),
        } for cell_type, body in cells],
        "metadata": {
            "kernelspec": {"display_name": "Python 3", "language": "python",
                           "name": "python3"},
            "language_info": {"name": "python"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("py_path")
    parser.add_argument("--output", default=None)
    args = parser.parse_args()

    output = args.output or os.path.splitext(args.py_path)[0] + ".ipynb"
    with open(output, "w") as file:
        json.dump(render_notebook(args.py_path), file, indent=1)
        file.write("\n")
    print(output)


if __name__ == "__main__":
    main()
