"""Deterministic FIXTURES.md-shaped synthetic frames (weather/stock/tomtom)
for reference-parity pipeline tests: mode ties, null domains, one-hot
'other' categories, ±30 s stream overlap."""

from __future__ import annotations

import random
from datetime import datetime, timedelta

WEATHER_MAIN = ["Thunderstorm", "Drizzle", "Rain", "Snow", "Clear", "Clouds",
                "Mist", "Haze"]  # Haze/Mist exercise the 'other' one-hot flag
WEATHER_DESC = ["light rain", "clear sky", "few clouds", "overcast", "mist"]


def weather_rows(n_hours: int = 8, per_hour: int = 6, seed: int = 7):
    rng = random.Random(seed)
    base = datetime(2024, 3, 1, 0, 0, 0)
    rows = []
    for h in range(n_hours):
        for i in range(per_hour):
            ts = base + timedelta(hours=h, minutes=i * (60 // per_hour))
            temp = round(rng.gauss(15, 10), 2)
            rows.append((
                temp, rng.choice(WEATHER_DESC), rng.randrange(1000, 10001, 500),
                rng.randint(980, 1040), rng.randint(0, 100), round(temp + rng.uniform(-3, 3), 2),
                round(temp + rng.uniform(0, 3), 2), rng.choice(WEATHER_MAIN),
                round(temp - rng.uniform(0, 3), 2), rng.randint(0, 100),
                round(rng.uniform(0, 25), 2), ts))
    cols = ["temp", "weather_description", "visibility", "pressure", "clouds",
            "feels_like", "temp_max", "weather_main", "temp_min", "humidity",
            "wind_speed", "timestamp"]
    return rows, cols


def stock_rows(n_hours: int = 8, per_hour: int = 6, seed: int = 11):
    rng = random.Random(seed)
    base = int(datetime(2024, 3, 1, 14, 0, 0).timestamp())  # NY market hours
    rows = []
    price = 100.0
    for h in range(n_hours):
        for i in range(per_hour):
            ts = base + h * 3600 + i * (3600 // per_hour)
            o = round(price + rng.uniform(-2, 2), 2)
            c = round(o + rng.uniform(-2, 2), 2)
            hi, lo = round(max(o, c) + rng.uniform(0, 1), 2), round(min(o, c) - rng.uniform(0, 1), 2)
            rows.append((rng.randint(1000, 1000000), round((hi + lo) / 2, 2),
                         o, c, hi, lo, ts, rng.randint(10, 10000),
                         rng.choice(["AAPL", "MSFT", "GOOG"]),
                         rng.choice(["OK", "DELAYED"]),
                         datetime.utcfromtimestamp(ts) if rng.random() > 0.05 else None))
            price = c
    cols = ["volume", "vwap", "open", "close", "high", "low", "timestamp",
            "transactions", "ticker", "status", "datetime"]
    return rows, cols


def tomtom_rows(n_hours: int = 6, seed: int = 13):
    rng = random.Random(seed)
    base = datetime(2024, 3, 1, 6, 0, 0)
    rows = []
    ids = [f"inc{j}" for j in range(12)]
    for h in range(n_hours):
        for _ in range(30):
            rows.append((
                str(rng.randint(1, 9)), rng.choice(ids),
                rng.choice(["certain", "probable", "risk_of"]),
                round(rng.uniform(0, 3600), 1) if rng.random() > 0.1 else None,
                str(rng.randint(0, 4)),
                round(rng.uniform(50, 5000), 1) if rng.random() > 0.1 else None,
                base + timedelta(hours=h, minutes=rng.randint(0, 59))))
    cols = ["iconCategory", "id", "probabilityOfOccurrence", "delay",
            "magnitudeOfDelay", "length", "observationTime"]
    return rows, cols
