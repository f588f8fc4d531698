from mtamrecommender_tpu.cli import main

raise SystemExit(main())
