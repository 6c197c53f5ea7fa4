from craytpu.main import main

raise SystemExit(main())
