from gcm_tpu.cli import main

raise SystemExit(main())
