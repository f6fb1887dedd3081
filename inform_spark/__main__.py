from inform_spark.cli import main

raise SystemExit(main())
