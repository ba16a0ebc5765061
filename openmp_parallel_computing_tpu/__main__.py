from openmp_parallel_computing_tpu.cli import main

raise SystemExit(main())
