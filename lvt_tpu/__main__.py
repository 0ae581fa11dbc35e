from lvt_tpu.cli import main

raise SystemExit(main())
