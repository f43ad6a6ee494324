"""One process of the N-process CPU cluster driving the REAL ``sr_mfe``
train CLI (tests/test_multihost.py::test_cli_two_process_loss_parity).

Unlike multihost_worker.py (which drives hand-built steps), this exercises
the product path end-to-end: ``sr_mfe -p train -c <cfg> -dist`` —
cluster join via FASTDIFFSR_TPU_* env vars, global mesh, rank-split
loader, replicated state/rng, proc-0-gated checkpointing (VERDICT r2
missing #1; reference analogue: EDiffSR/codes/config/sisr/train.py:28-40
-launcher pytorch + env RANK).

Usage: python multihost_cli_worker.py <pid> <nproc> <port> <cfg> <workdir>
"""

import os
import sys


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    cfg, workdir = sys.argv[4], sys.argv[5]

    # the pytest parent forces 8 host-platform devices per process; each
    # cluster process must instead contribute its share of a 4-device
    # global mesh (2 procs x 2 devices; 1 proc x 4 for the reference run)
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = " ".join(
        t for t in flags.split()
        if "xla_force_host_platform_device_count" not in t)
    os.environ["FASTDIFFSR_TPU_COORD"] = f"127.0.0.1:{port}"
    os.environ["FASTDIFFSR_TPU_NPROCS"] = str(nproc)
    os.environ["FASTDIFFSR_TPU_PROC_ID"] = str(pid)
    os.environ["FASTDIFFSR_TPU_LOCAL_DEVICES"] = str(4 // nproc)
    os.environ["FASTDIFFSR_TPU_DIST_PLATFORM"] = "cpu"

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    os.makedirs(workdir, exist_ok=True)
    os.chdir(workdir)  # experiment dirs land under <workdir>/experiments

    from fastdiffsr_tpu.cli.sr_mfe import main as cli_main

    cli_main(["-p", "train", "-c", cfg, "-dist"])
    print("CLI-WORKER-DONE", flush=True)

    import jax
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
