#!/usr/bin/env python
"""Edit a parameter inside an XML bundle (analog of the reference's
sed-based scripts/setparameters.sh, but structure-aware).

Usage: setparameters.py <file.xml> <Sublist/.../Name> <value>
Example: setparameters.py ocean_params.xml \
             "THCM/Starting Parameters/Combined Forcing" 0.5
"""

import sys


def main(argv):
    if len(argv) != 3:
        print(__doc__)
        return 1
    path, dotted, value = argv
    from iemic_tpu.config import read_xml, write_xml

    p = read_xml(path)
    *sublists, name = dotted.split("/")
    node = p
    for s in sublists:
        node = node.sublist(s)
    # preserve existing type if the parameter exists
    if name in node:
        old = node[name]
        caster = type(old)
        if isinstance(old, bool):
            value = value.lower() in ("1", "true", "yes")
        else:
            value = caster(value)
    node.set(name, value)
    write_xml(p, path)
    print(f"{path}: {dotted} = {value}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
