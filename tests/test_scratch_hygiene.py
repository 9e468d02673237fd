"""Two-process scratch-dir hygiene (VERDICT r5 #8).

Round 5's ops fix namespaced the deterministic scratch root by PID
after a real race: a bench run's interpreter-exit cleanup rmtree'd the
staging directory a concurrent test run was still streaming from
("basePath not found" mid-read). This pins the contract with actual
second processes, no Spark needed:

- two concurrent processes resolve DISJOINT scratch roots;
- a process's exit cleanup removes ITS OWN root only — files staged by
  a sibling process survive.
"""

from __future__ import annotations

import os
import subprocess
import sys

from nyc_traffic_insight_spark.queries.core import _tmp

_CHILD = r"""
import os, sys
sys.path.insert(0, {repo!r})
from nyc_traffic_insight_spark.queries.core import _tmp

parent_file = sys.argv[1]
# the sibling's staged file must be visible and untouchable from here
assert os.path.exists(parent_file), "sibling scratch file missing"
mine = _tmp("/root/testdata/sf0.001", "probe.txt")
assert f"pid{{os.getpid()}}" in mine, mine
assert os.path.dirname(mine) != os.path.dirname(parent_file)
os.makedirs(os.path.dirname(mine), exist_ok=True)
with open(mine, "w") as f:
    f.write("child")
print(mine)
# interpreter exit now runs the atexit cleanup for THIS pid's root only
"""

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_scratch_roots_are_pid_disjoint_and_cleanup_is_scoped():
    parent_file = _tmp("/root/testdata/sf0.001", "probe.txt")
    assert f"pid{os.getpid()}" in parent_file
    os.makedirs(os.path.dirname(parent_file), exist_ok=True)
    with open(parent_file, "w") as f:
        f.write("parent")

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CHILD.format(repo=_REPO), parent_file],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for _ in range(2)
    ]
    child_files = []
    for p in procs:
        out, err = p.communicate(timeout=60)
        assert p.returncode == 0, f"child failed:\n{err}"
        child_files.append(out.strip().splitlines()[-1])

    # children saw disjoint roots from each other too
    assert len({os.path.dirname(f) for f in child_files}) == 2
    # each child's atexit removed its own root...
    for f in child_files:
        assert not os.path.exists(f), f"child scratch survived exit: {f}"
    # ...and did NOT touch the sibling's staged file
    assert os.path.exists(parent_file)
    with open(parent_file) as f:
        assert f.read() == "parent"
