"""Regenerate ``__spark_entry__._BACKFILL`` from the committed
CORRECTNESS_r*.json driver artifacts.

The backfill list drives the 50-slot window rotation: every non-guard
registered query, ordered oldest-driver-row first (ascending query
number within a round). Until round 11 the list was re-derived by
hand at each round open; this tool makes the step mechanical and
tests/test_contract.py::test_backfill_matches_artifacts keeps the
committed list provably in sync with the committed artifacts — if a
new CORRECTNESS_r{N}.json lands without the rotation, the suite goes
red instead of the window silently re-scoring fresh rows.

Usage:
    python tools/regen_backfill.py            # print the regenerated list
    python tools/regen_backfill.py --check    # exit 1 if it differs from
                                              # the committed _BACKFILL

Stdlib-only on purpose (no pyspark import): the regeneration reads the
artifacts and parses the current list textually, so it runs in
milliseconds and the sync test adds no Spark session cost.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENTRY = os.path.join(REPO, "__spark_entry__.py")

#: Guard queries live outside the rotation (window head/tail pins and
#: the retired per-table fingerprints) — mirror of the entry module's
#: _GUARD_HEAD / _GUARD_TAIL / _RETIRED_GUARDS, asserted in the sync
#: test so the two can't drift.
GUARDS = frozenset(
    {
        "q000_generation_fingerprint",
        "q997_generation_fingerprint_tail",
        "q00c_fingerprint_customer",
        "q00d_fingerprint_documents",
        "q00e_fingerprint_events",
        "q00l_fingerprint_lineitem",
        "q00o_fingerprint_orders",
    }
)


def newest_driver_rows(repo: str = REPO) -> dict[str, int]:
    """name -> newest round with a driver row, from CORRECTNESS_r*.json."""
    rows: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        match = re.search(r"r(\d+)\.json$", path)
        if match is None:
            # a stray editor backup or partial file matching the glob
            # must fail with its NAME, not an AttributeError
            raise RuntimeError(f"unrecognized correctness artifact name: {path}")
        round_no = int(match.group(1))
        try:
            with open(path) as fh:
                artifact = json.load(fh)
        except (OSError, ValueError) as exc:
            # a truncated artifact must fail loudly: silently skipping a
            # round would mis-order the rotation for every query in it
            raise RuntimeError(f"unreadable correctness artifact {path}") from exc
        for name in artifact:
            rows[name] = max(rows.get(name, 0), round_no)
    return rows


def current_backfill(entry_path: str = ENTRY) -> list[str]:
    """Parse the committed _BACKFILL literal (no pyspark import)."""
    src = open(entry_path).read()
    match = re.search(r"_BACKFILL = \[(.*?)\n\]", src, re.S)
    if match is None:
        raise RuntimeError(f"_BACKFILL literal not found in {entry_path}")
    return re.findall(r'"(q[^"]+)"', match.group(1))


def _qnum(name: str) -> int:
    return int(name.split("_", 1)[0][1:])


def regenerate(
    repo: str = REPO,
    entry_path: str = ENTRY,
    registered: set[str] | None = None,
) -> list[str]:
    """Ordered backfill: every non-guard query that is committed,
    driver-scored, or (when ``registered`` is given) registered —
    oldest newest-driver-row first, then ascending query number.

    ``registered`` is the live registry (``set(entry.queries())``):
    with it, orphan artifact rows from renamed/retired queries are
    dropped exactly, and registered-but-unlisted queries are forced
    into the regeneration so ``--check``/the sync test catches a
    query that was scored (or registered) but never added to
    _BACKFILL. Without it (the no-pyspark CLI path), scored names
    missing from the committed list are KEPT with a stderr note —
    silently dropping a scored query from the rotation is the worse
    failure; verify retired names by hand before pasting.

    Queries registered but never driver-scored (a mid-freeze addition)
    keep rotating last — they sort as "newer than every artifact" so
    the genuinely stale rows refresh first; their own first row lands
    via _ordered()'s is-new path anyway when their number is >= 179.
    """
    rows = newest_driver_rows(repo)
    names = set(current_backfill(entry_path)) | (set(rows) - GUARDS)
    if registered is not None:
        live = set(registered) - GUARDS
        orphans = names - live
        if orphans:
            print(
                f"note: names without a registered twin, dropped: "
                f"{sorted(orphans)}",
                file=sys.stderr,
            )
        # the registered set IS the universe: committed/scored names
        # only matter for the orphan warning above
        names = live
    else:
        uncommitted = (set(rows) - GUARDS) - set(current_backfill(entry_path))
        if uncommitted:
            print(
                "note: artifact rows missing from the committed _BACKFILL "
                f"(kept — verify they are still registered): "
                f"{sorted(uncommitted)}",
                file=sys.stderr,
            )
    never_scored = max(rows.values(), default=0) + 1  # after every real round
    return sorted(names, key=lambda n: (rows.get(n, never_scored), _qnum(n)))


def render(ordered: list[str], rows: dict[str, int]) -> str:
    """The list body with the round separator comments, paste-ready."""
    lines: list[str] = []
    last_round: int | None = None
    for name in ordered:
        round_no = rows.get(name)
        if round_no != last_round:
            label = f"round {round_no}" if round_no else "never driver-scored"
            lines.append(f"    # -- newest driver row: {label} --")
            last_round = round_no
        lines.append(f'    "{name}",')
    return "\n".join(lines)


def main(argv: list[str]) -> int:
    regen = regenerate()
    if "--check" in argv:
        committed = current_backfill()
        if committed == regen:
            print(f"in sync: {len(regen)} queries")
            return 0
        drift = [
            (i, a, b)
            for i, (a, b) in enumerate(zip(committed, regen))
            if a != b
        ]
        print(
            f"OUT OF SYNC: committed {len(committed)} vs regenerated "
            f"{len(regen)}; first drift: {drift[:3] if drift else 'length only'}"
        )
        return 1
    print(render(regen, newest_driver_rows()))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
