#!/usr/bin/env python
"""COCO error analysis (precision curves only).

reference: ``tools/coco_error_analysis.py:1-171`` — identical to
``coco_error_analysis_f1.py`` minus the F1 transform; implementation is
shared (``tools/coco_error_analysis_f1.py``).
"""

from coco_error_analysis_f1 import main

if __name__ == "__main__":
    main(with_f1=False)
