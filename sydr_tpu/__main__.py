from sydr_tpu.main import main

raise SystemExit(main())
