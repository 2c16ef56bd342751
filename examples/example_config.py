"""Example crawl configuration — the analog of the reference's
tests/assets/basic_config.py: declare sites and the output field
schema; run with

    spark-submit --py-files dist/ftw_crawler_spark.zip \\
        jobs/crawl_submit.py --config examples/example_config.py \\
        --world <world_dir> --out <out_dir>
"""

from datetime import datetime

from ftw_crawler_spark.config import (ConstantExtractor, CrawlerConfig,
                                      Field, HeaderMappingExtractor,
                                      KeywordsExtractor,
                                      LastModifiedExtractor,
                                      PlainTextExtractor, Site,
                                      SlugExtractor, SnippetTextExtractor,
                                      TitleExtractor, UIDExtractor,
                                      URLExtractor)

SITES = [
    Site(0, "https://site0.example.ch/", sleeptime=0.1,
         attributes={"site_area": "Site Zero"}),
    Site(1, "http://site1.example.org/", sleeptime=0.05,
         attributes={"site_area": "Site One"}),
]

FIELDS = [
    Field("UID", UIDExtractor(), required=True),
    Field("url", URLExtractor()),
    Field("getId", SlugExtractor()),
    Field("Title", TitleExtractor()),
    Field("SearchableText", PlainTextExtractor()),
    Field("snippetText", SnippetTextExtractor()),
    Field("Subject", KeywordsExtractor(), multivalued=True),
    Field("modified", LastModifiedExtractor(), type_=datetime,
          required=True),
    Field("portal_type", HeaderMappingExtractor(
        "content-type",
        {"text/html": "ContentPage", "application/pdf": "File"},
        default="File")),
    Field("showinsearch", ConstantExtractor(True), type_=bool),
]

CONFIG = CrawlerConfig(sites=SITES, fields=FIELDS, url_field="url")
