"""One-step round open: regenerate ``_BACKFILL`` and splice it into
``__spark_entry__.py`` in place.

Per the r12 verdict's ask #1, the round-open choreography (run
``tools/regen_backfill.py``, hand-paste the rendered list into the
entry module, commit it together with the just-landed driver
artifacts) kept leaving a judge-time red on
``tests/test_contract.py::test_backfill_matches_artifacts`` whenever
the paste lagged the artifact. This tool collapses regen + paste into
one idempotent step so the forcing function can only ever trip on a
genuinely missing regeneration, not on choreography.

Usage:
    python tools/round_open.py            # splice regenerated list in place
    python tools/round_open.py --dry-run  # show whether a splice is needed

Exit status: 0 when the committed list is (now) in sync, 1 when
--dry-run finds drift. Stdlib-only, same as regen_backfill.
"""

from __future__ import annotations

import re
import sys

import regen_backfill as rb


def splice(entry_path: str = rb.ENTRY) -> bool:
    """Replace the ``_BACKFILL`` literal body; True if the file changed."""
    ordered = rb.regenerate(entry_path=entry_path)
    body = rb.render(ordered, rb.newest_driver_rows())
    src = open(entry_path).read()
    new_src, n = re.subn(
        r"_BACKFILL = \[.*?\n\]",
        "_BACKFILL = [\n" + body + "\n]",
        src,
        count=1,
        flags=re.S,
    )
    if n != 1:
        raise RuntimeError(f"_BACKFILL literal not found in {entry_path}")
    if new_src == src:
        return False
    with open(entry_path, "w") as fh:
        fh.write(new_src)
    return True


def main(argv: list[str]) -> int:
    in_sync = rb.current_backfill() == rb.regenerate()
    if "--dry-run" in argv:
        print("in sync" if in_sync else "drift: splice needed")
        return 0 if in_sync else 1
    if in_sync:
        print("already in sync; nothing to do")
        return 0
    splice()
    # re-verify through the same path the contract test uses
    if rb.current_backfill() != rb.regenerate():
        print("ERROR: still out of sync after splice", file=sys.stderr)
        return 1
    head = rb.current_backfill()[:3]
    print(f"spliced {len(rb.current_backfill())} queries; window head: {head}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
