"""spark-submit entrypoint: timezone assignment over a geotagged table.

The multi-executor launch path (north_rule "runs via spark-submit
--py-files"):

    cd /root/repo && python -c "from tzengine.session import ensure_shipped" \
      # or pre-build the zip:
    python -c "import zipfile,os; zf=zipfile.ZipFile('/tmp/tzengine.zip','w'); \
      [zf.write(os.path.join(r,f), os.path.relpath(os.path.join(r,f),'.')) \
       for r,_,fs in os.walk('tzengine') for f in fs if f.endswith('.py')]"
    spark-submit --py-files /tmp/tzengine.zip scripts/run_assign.py \
      --zones-geojson world.geojson --input geo_images/ --output out/ \
      --region -90,-180,90,180

(In local sandbox runs the engine also self-ships via addPyFile, so plain
``python scripts/run_assign.py`` works too.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="tzengine timezone assignment job")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--zones-geojson", help="GeoJSON FeatureCollection path")
    src.add_argument("--zones-geojsonl", help="line-delimited GeoJSON features")
    src.add_argument("--artifact", help="saved index artifact dir")
    src.add_argument("--zones-tar",
                     help="reference-format tar map archive "
                          "(version marker + FlatBuffers entries)")
    src.add_argument("--synthetic-world", action="store_true",
                     help="use the built-in synthetic test world")
    ap.add_argument("--input", required=True, help="parquet dir/file with lat/lon columns")
    ap.add_argument("--output", required=True, help="output table dir (resumable)")
    ap.add_argument("--region", default="-90,-180,90,180",
                    help="min_lat,min_lon,max_lat,max_lon")
    ap.add_argument("--lat-col", default="lat")
    ap.add_argument("--lon-col", default="lon")
    ap.add_argument("--mode", choices=["strict", "pipeline"], default="pipeline")
    ap.add_argument("--world-version", default="unknown")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from tzengine.session import get_spark
    from tzengine.engine import TzEngine
    from tzengine import tables

    spark = get_spark("tzengine-assign", master=args.master)
    min_lat, min_lon, max_lat, max_lon = (float(x) for x in args.region.split(","))

    if args.artifact:
        eng = TzEngine.from_artifact(spark, args.artifact)
    elif args.zones_tar:
        eng = TzEngine.from_tar_archive(
            spark, args.zones_tar, min_lat, min_lon, max_lat, max_lon
        )
    else:
        if args.synthetic_world:
            from tzengine.zones import synthetic_world

            zones = synthetic_world()
        elif args.zones_geojsonl:
            from tzengine.geojson import zones_from_geojsonl

            zones = zones_from_geojsonl(spark, args.zones_geojsonl)
        else:
            from tzengine.geojson import zones_from_geojson

            zones = zones_from_geojson(spark, args.zones_geojson)
        eng = TzEngine.for_region(
            spark, zones, min_lat, min_lon, max_lat, max_lon,
            world_version=args.world_version,
        )

    df = spark.read.parquet(args.input)
    assigned = eng.assign_timezones(
        df, lat_col=args.lat_col, lon_col=args.lon_col, mode=args.mode
    )
    snapshot = tables.write_resumable(
        assigned,
        args.output,
        input_lineage={"input": args.input, "region": args.region,
                       "map_version": eng.map_version},
    )
    print(json.dumps(snapshot))
    spark.stop()


if __name__ == "__main__":
    main()
