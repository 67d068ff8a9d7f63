"""map_batches stages: fetch/parse (actor pool) + discover/offer."""
