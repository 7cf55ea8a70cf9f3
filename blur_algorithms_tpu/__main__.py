from blur_algorithms_tpu.cli import main

raise SystemExit(main())
