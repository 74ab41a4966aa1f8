"""Background output writer.

The reference overlaps ECL/VTK output with computation by handing write
jobs to a dedicated thread (ThreadHandle,
/root/reference/opm/simulators/ThreadHandle.hpp:37-220: worker thread +
mutex-protected object queue, used by BlackoilOutputWriter's asyncOutput_).
Same capability here: a daemon worker draining a queue of (fn, args)
closures; `sync()` blocks until everything queued so far is on disk.
"""

from __future__ import annotations

import queue
import threading
import traceback


class ThreadHandle:
    def __init__(self):
        self._q: "queue.Queue" = queue.Queue()
        self._errors: list = []
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def _run(self):
        while True:
            item = self._q.get()
            if item is None:
                self._q.task_done()
                return
            fn, args, kwargs = item
            try:
                fn(*args, **kwargs)
            except Exception:  # surfaced at sync()
                self._errors.append(traceback.format_exc())
            finally:
                self._q.task_done()

    def submit(self, fn, *args, **kwargs):
        """Queue a write job. Device arrays must be converted to numpy by
        the CALLER (np.asarray) so the worker never touches the JAX
        runtime mid-trace."""
        self._q.put((fn, args, kwargs))

    def sync(self, *, raise_errors=True):
        """Block until all queued jobs finished; re-raise worker errors."""
        self._q.join()
        if self._errors and raise_errors:
            errs, self._errors = self._errors, []
            raise RuntimeError("async output failed:\n" + "\n".join(errs))

    def close(self):
        self.sync(raise_errors=False)
        self._q.put(None)
        self._worker.join(timeout=10)
