import sys

from data_quality_framework_ray.cli import main

sys.exit(main())
