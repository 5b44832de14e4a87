from membrane_solver_tpu.cli import main

raise SystemExit(main())
