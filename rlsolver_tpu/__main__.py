"""`python -m rlsolver_tpu` — the unified CLI (see rlsolver_tpu.run)."""

from rlsolver_tpu.run import main

raise SystemExit(main())
