"""2-process multi-host dryrun (DCN stand-in via local TCP/Gloo).

Spawns two CPU processes that join one `jax.distributed` cluster, build the
global data mesh, load disjoint host shards via
`epoch_batches(host_id, num_hosts)`, and run ONE globally-sharded train
step (SURVEY.md §2.5 multi-host plan; VERDICT r1 Missing #6).

Gated behind STRAPS_MULTIHOST=1: two concurrent CPU train-step compiles
take several minutes on this one-core host.  Run explicitly with:

    STRAPS_MULTIHOST=1 python -m pytest tests/test_multihost.py -q
or  python __graft_entry__.py multihost 2 4
"""

import os
import sys

import pytest


@pytest.mark.skipif(os.environ.get("STRAPS_MULTIHOST") != "1",
                    reason="set STRAPS_MULTIHOST=1 (slow: 2 concurrent CPU "
                           "train-step compiles)")
def test_two_process_multihost_dryrun():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __graft_entry__ as entry
    entry.dryrun_multihost(num_processes=2, devices_per_process=4)
