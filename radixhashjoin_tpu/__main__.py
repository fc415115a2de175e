"""CLI entry: `python -m radixhashjoin_tpu < init+work` — the reference's
`cat small/small.init small/small.work | ./join` contract (Makefile:13-14).
"""

from .models.engine import main

if __name__ == "__main__":
    main()
