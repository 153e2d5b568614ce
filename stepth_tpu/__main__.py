from stepth_tpu.cli import main

raise SystemExit(main())
