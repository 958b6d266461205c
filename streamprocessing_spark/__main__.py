from streamprocessing_spark.cli import main

raise SystemExit(main())
