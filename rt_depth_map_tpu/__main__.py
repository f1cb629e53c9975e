from rt_depth_map_tpu.cli import main

raise SystemExit(main())
