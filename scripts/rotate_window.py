"""Propose the next GRADE_FIRST window from the latest CORRECTNESS file.

The driver grades the first 50 ``queries()`` entries per round
(registry.py::GRADE_FIRST). After a round lands, run this to get the next
window: ops whose driver evidence is still missing or non-green, ranked
never-graded-first, then failed, padded with the oldest-evidence greens if
fewer than 50 remain.

Usage: python scripts/rotate_window.py CORRECTNESS_r04.json [more...]
Prints a ready-to-paste GRADE_FIRST tuple and a coverage summary.
"""
import json
import sys

sys.path.insert(0, "/root/repo")

from userportrait.registry import load_all_ops


def main(paths):
    ops = list(load_all_ops())
    best: dict[str, str] = {}  # op -> LATEST driver evidence (newest round wins)
    # Process oldest->newest and always overwrite, so an op that regressed
    # after once passing re-enters the window instead of being shadowed by
    # a stale green (a green must be re-earned after any failure).
    for path in sorted(paths):
        data = json.load(open(path))
        for k, v in data.items():
            if v.get("hash_match") or v.get("err") == "no_oracle":
                best[k] = "green"
            else:
                best[k] = "failed"
    never = [k for k in ops if k not in best]
    failed = [k for k in ops if best.get(k) == "failed"]
    window = (failed + never)[:50]
    if len(window) < 50:
        window += [k for k in ops if k not in set(window)][: 50 - len(window)]
    print(f"# graded green: {sum(1 for v in best.values() if v == 'green')}")
    print(f"# failed: {len(failed)} {failed}")
    print(f"# never graded: {len(never)}")
    print("GRADE_FIRST: tuple[str, ...] = (")
    for k in window:
        print(f'    "{k}",')
    print(")")


if __name__ == "__main__":
    main(sys.argv[1:] or ["CORRECTNESS_r02.json", "CORRECTNESS_r03.json"])
