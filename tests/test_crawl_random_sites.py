"""Randomized-topology crawl equality sweep.

The fixed e2e scenarios (test_crawl_e2e.py) pin known behaviors; this
sweep generates seeded-random site graphs — random link structure,
relative/absolute/fragment/query links, cross-host leakage, dead links,
retryable failures, robots disallows — and asserts the engine's
seen-set, crawl order and span sequences equal the sequential oracle on
every one. Seeds are fixed (deterministic CI), but the topology space
is adversarial in a way hand-written fixtures are not.
"""

import random

import pytest

from inform_spark.plans.crawl import CrawlConfig, CrawlEngine
from inform_spark.reference_impl import crawl_sequential
from inform_spark.schemas import ROBOTS
from tests.test_crawl_e2e import assert_engine_equals_oracle


def random_site(rng: random.Random, n_hosts: int = 2, pages_per_host: int = 10):
    hosts = [f"site{h}.rnd" for h in range(n_hosts)]
    all_urls = {
        h: [f"https://{h}/"] + [f"https://{h}/p{i}" for i in range(1, pages_per_host)]
        for h in hosts
    }
    pages = []
    for h in hosts:
        urls = all_urls[h]
        for u in urls:
            links = []
            # same-host links in assorted syntaxes
            for t in rng.sample(urls, k=rng.randint(2, min(6, len(urls)))):
                style = rng.randrange(4)
                if style == 0:
                    links.append(t)  # absolute
                elif style == 1:
                    links.append(t.replace(f"https://{h}", ""))  # root-relative
                elif style == 2:
                    links.append(t + "#frag" + str(rng.randrange(3)))
                else:
                    links.append(t + "?q=" + str(rng.randrange(2)))
            # cross-host leakage (must be filtered by F2)
            other = hosts[(hosts.index(h) + 1) % len(hosts)]
            if rng.random() < 0.7:
                links.append(all_urls[other][rng.randrange(pages_per_host)])
            # dead link (fixture 404) and a skipped extension
            if rng.random() < 0.5:
                links.append(f"https://{h}/missing-{rng.randrange(3)}")
            if rng.random() < 0.5:
                links.append(f"https://{h}/asset-{rng.randrange(3)}.pdf")
            body = "".join(f'<a href="{x}">x</a>' for x in links)
            pages.append(
                dict(
                    url=u,
                    host=h,
                    status_code=200,
                    content_type="text/html",
                    html=(
                        f"<html><body><main><h1>{u}</h1>"
                        f"<p>content of {u}</p>{body}</main></body></html>"
                    ),
                    retries_needed=rng.choice([0, 0, 0, 1]),
                )
            )
    robots = [
        dict(
            host=h,
            exists=rng.random() < 0.7,
            disallow_prefixes=["/p3"] if rng.random() < 0.5 else [],
            crawl_delay_ms=None,
        )
        for h in hosts
    ]
    return pages, robots


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_random_site_engine_equals_oracle(spark, tmp_path, seed):
    rng = random.Random(seed)
    pages, robots = random_site(rng)
    seed_url = "https://site0.rnd/"
    oracle = crawl_sequential(pages, robots, seed_url, limit=40)
    pages_df = spark.createDataFrame(pages)
    robots_df = spark.createDataFrame(
        [
            (r["host"], r["exists"], r["disallow_prefixes"], r["crawl_delay_ms"])
            for r in robots
        ],
        schema=ROBOTS,
    )
    eng = CrawlEngine(
        spark,
        pages_df,
        robots_df,
        CrawlConfig(seeds=[seed_url], limit=40),
        checkpoint_dir=str(tmp_path / f"s{seed}"),
    )
    eng.run()
    assert_engine_equals_oracle(eng, oracle)
