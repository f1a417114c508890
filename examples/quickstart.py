"""Quickstart: the reference README's "pubs within Zurich" flow, on Spark.

Run:  python examples/quickstart.py
(or spark-submit --py-files libgeodesk_spark.zip examples/quickstart.py)

Mirrors the reference usage (libgeodesk README.md:92-103):

    Features world("world.gol");
    Features pubs = world("na[amenity=pub]");
    Features inZurich = pubs.within(zurich);
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from pyspark.sql import functions as F

from libgeodesk_spark.api import Features
from libgeodesk_spark.geom.zones import prepare_zone
from libgeodesk_spark.session import build_session
from libgeodesk_spark.sources.images import images_table
from libgeodesk_spark.sources.points import GATE_ZONES, X0, Y0


def main():
    spark = build_session("quickstart", cpus=8)

    # 1. the "world": an image+caption fact table with int32 Mercator x/y
    world = Features(images_table(spark, "/root/testdata/sf0.001"))
    print("world:", world.count(), "images")

    # 2. GOQL selector — compiles to ONE Catalyst filter, no Python
    pngs = world("*[fmt=png]")
    print("pngs:", pngs.count())

    # 3. spatial predicate — broadcast prepared-zone join ("within Zurich")
    zurich = prepare_zone("zurich", [np.array(r) for r in GATE_ZONES["comb"]])
    inside = pngs.within(zurich)
    print("png images within the zone:", inside.count())

    # 4. proximity — kNN and radius
    q = (X0 + 4_000_000, Y0 + 4_000_000)
    print("5 nearest:", [r.image_id for r in inside.nearest(*q, 5).collect()])
    print("within 5 km:", world.max_meters_from(5000.0, *q).count())

    # 5. export
    print(inside.filter(F.col("salt") == 3).to_geojson(
        props=["image_id", "caption"], limit=2))

    spark.stop()


if __name__ == "__main__":
    main()
