#!/bin/sh
# Build the --py-files artifact for spark-submit.
set -e
cd "$(dirname "$0")/.."
rm -f ir_spark.zip
python -c "
import zipfile, os
with zipfile.ZipFile('ir_spark.zip', 'w') as z:
    for root, _, files in os.walk('information_retrieval_images_spark'):
        for f in files:
            if f.endswith('.py'):
                p = os.path.join(root, f)
                z.write(p, p)
print('wrote ir_spark.zip')
"
