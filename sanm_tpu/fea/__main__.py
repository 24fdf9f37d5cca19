"""CLI entry: ``python -m sanm_tpu.fea <sys.json> <task.json> [...]``
(counterpart of the reference ``fea`` binary, ``fea/main.cpp:1104-1119``).
"""

import os
import resource
import sys

import sanm_tpu

from .app import do_main


def main():
    sanm_tpu.enable_compile_cache()
    try:
        ret = do_main(sys.argv[1:])
    except Exception as e:  # noqa: BLE001
        print("caught exception: %s" % e, file=sys.stderr)
        raise
    usage = resource.getrusage(resource.RUSAGE_SELF)
    print("memory: %.3fGiB" % (usage.ru_maxrss / (1024.0 * 1024)))
    sys.exit(ret)


if __name__ == "__main__":
    main()
