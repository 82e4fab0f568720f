from mlis_tpu.cli import main

raise SystemExit(main())
