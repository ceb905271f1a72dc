#!/usr/bin/env python3
"""Generate docs/cli-reference.md from the live argparse parser.

The reference maintains its CLI page by hand (/root/reference/docs/cli-reference.md);
here the page is generated from ``panmap_tpu.__main__.build_parser()`` so it can
never drift from the actual option surface.  Run::

    python tools/gen_cli_reference.py            # rewrites docs/cli-reference.md
    python tools/gen_cli_reference.py --check    # exit 1 if the page is stale
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from panmap_tpu.__main__ import build_parser  # noqa: E402

HEADER = """# CLI Reference

Full option surface of `python -m panmap_tpu`, generated from the argument
parser by `tools/gen_cli_reference.py` — regenerate after changing
`panmap_tpu/__main__.py`.

Two-tier help: `--help` shows the common + single-sample groups;
`--help-all` prints everything below.

```bash
python -m panmap_tpu [options] <panman> [reads1] [reads2]
```
"""


def _md_escape(s: str) -> str:
    return s.replace("|", "\\|").replace("\n", " ")


def _flags(action: argparse.Action) -> str:
    if not action.option_strings:
        return f"`{action.dest}`"
    parts = ", ".join(f"`{o}`" for o in action.option_strings)
    metavar = ""
    if action.nargs != 0 and not isinstance(
        action, (argparse._StoreTrueAction, argparse._StoreFalseAction, argparse._CountAction)
    ):
        mv = action.metavar
        if mv is None and action.choices is not None:
            mv = "{" + ",".join(map(str, action.choices)) + "}"
        elif mv is None:
            mv = action.dest.upper()
        if isinstance(mv, tuple):
            mv = " ".join(mv)
        metavar = f" `{mv}`"
    return parts + metavar


def _default(action: argparse.Action) -> str:
    if action.default is None or action.default is argparse.SUPPRESS:
        return ""
    if action.default is False:
        return ""
    if action.default == "" and action.nargs != 0:
        return ""
    return f"`{action.default}`"


def generate() -> str:
    p = build_parser()
    out = [HEADER]
    for group in p._action_groups:
        rows = []
        for a in group._group_actions:
            if isinstance(a, argparse._HelpAction):
                rows.append(("`-h`, `--help` / `--help-all`", "", "two-tier help (common / everything)"))
                continue
            rows.append((_flags(a), _default(a), _md_escape(a.help or "")))
        if not rows:
            continue
        title = (group.title or "options").strip()
        title = {"positional arguments": "Positional arguments", "options": "General"}.get(title, title.capitalize())
        out.append(f"\n## {title}\n")
        out.append("| Option | Default | Description |")
        out.append("|---|---|---|")
        for flags, default, help_ in rows:
            out.append(f"| {flags} | {default} | {help_} |")
    out.append("")
    return "\n".join(out)


def main() -> int:
    check = "--check" in sys.argv[1:]
    target = Path(__file__).resolve().parent.parent / "docs" / "cli-reference.md"
    text = generate()
    if check:
        if not target.exists() or target.read_text() != text:
            print(f"STALE: {target} does not match the parser; rerun tools/gen_cli_reference.py", file=sys.stderr)
            return 1
        print("cli-reference.md up to date")
        return 0
    target.parent.mkdir(parents=True, exist_ok=True)
    target.write_text(text)
    print(f"wrote {target} ({len(text.splitlines())} lines)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
