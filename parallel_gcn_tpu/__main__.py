from parallel_gcn_tpu.cli import main

raise SystemExit(main())
