"""Long-lived TPU job worker for this environment's tunneled device.

The axon tunnel serializes clients and holds a dead client's lease for
~20 min, so killing a hung script wedges every subsequent client. This
worker connects ONCE and then executes job scripts sequentially from
/tmp/tpuq: drop `NNN-name.py`, it runs with fresh __main__ globals
(runpy), stdout+stderr tee'd to `NNN-name.log`, and `NNN-name.done`
(exit status) written at the end. Touch /tmp/tpuq/STOP to shut the worker
down cleanly (releasing the device for the round-end driver bench).
"""
import io
import os
import runpy
import sys
import time
import traceback
from pathlib import Path

QDIR = Path("/tmp/tpuq")
QDIR.mkdir(exist_ok=True)


class Tee(io.TextIOBase):
    def __init__(self, *streams):
        self.streams = streams

    def write(self, s):
        for st in self.streams:
            st.write(s)
            st.flush()
        return len(s)

    def flush(self):
        for st in self.streams:
            st.flush()


def main():
    sys.path.insert(0, "/root/repo")
    print("worker: connecting to device...", flush=True)
    import jax
    import numpy as np
    print("worker: device =", jax.devices(), flush=True)
    np.asarray(jax.numpy.ones(4).sum())
    print("worker: device responsive; polling", QDIR, flush=True)
    done: set[str] = set()
    while True:
        if (QDIR / "STOP").exists():
            print("worker: STOP sentinel — exiting", flush=True)
            return
        jobs = sorted(p for p in QDIR.glob("*.py")
                      if p.name not in done
                      and not (QDIR / (p.stem + ".done")).exists())
        if not jobs:
            time.sleep(2.0)
            continue
        job = jobs[0]
        log = QDIR / (job.stem + ".log")
        print(f"worker: running {job.name} -> {log.name}", flush=True)
        rc = 0
        t0 = time.time()
        with open(log, "w") as lf:
            old_out, old_err = sys.stdout, sys.stderr
            sys.stdout = Tee(lf)
            sys.stderr = Tee(lf)
            try:
                runpy.run_path(str(job), run_name="__main__")
            except SystemExit as e:
                rc = int(e.code or 0)
            except BaseException:
                traceback.print_exc()
                rc = 1
            finally:
                sys.stdout, sys.stderr = old_out, old_err
        (QDIR / (job.stem + ".done")).write_text(
            f"{rc} {time.time() - t0:.1f}s\n")
        done.add(job.name)
        print(f"worker: {job.name} done rc={rc} "
              f"({time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
