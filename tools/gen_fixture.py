#!/usr/bin/env python3
"""Generate the deterministic 500-row sales fixture CSV (FIXTURES.md §A
schema replica — synthesized, NOT copied from the reference sample).

Index-based formulas, no RNG: re-running always reproduces the same
bytes. All measures are exact 2-decimal values so DECIMAL(18,2) sums
are exact in both Spark and DuckDB (the oracle hash-match trick).

Usage: python3 tools/gen_fixture.py   # writes fixtures/sales_data_500.csv
"""
import os

COUNTRIES = ["Angola", "Belize", "Chile", "Denmark", "Estonia",
             "Fiji", "Ghana", "Hungary", "Iceland", "Jordan"]
ITEMS = ["Beverages", "Cereal", "Clothes", "Cosmetics", "Fruits",
         "Household", "Meat", "OfficeSupplies", "PersonalCare", "Snacks"]
REGIONS = ["Asia", "Europe", "MiddleEastAndNorthAfrica", "NorthAmerica",
           "SubSaharanAfrica", "AustraliaAndOceania", "CentralAmericaAndCaribbean"]
CHANNELS = ["Online", "Offline"]
PRIORITIES = ["C", "H", "L", "M"]

HEADER = ("uuid,Country,ItemType,SalesChannel,OrderPriority,OrderDate,Region,"
          "ShipDate,UnitsSold,UnitPrice,UnitCost,TotalRevenue,TotalCost,TotalProfit")


def row(i: int) -> str:
    uuid = 700000000 + i * 1009  # 9-digit, unique
    country = COUNTRIES[(i * 7) % len(COUNTRIES)]
    item = ITEMS[(i * 3) % len(ITEMS)]
    channel = CHANNELS[i % 2]
    prio = PRIORITIES[(i * 5) % 4]
    om, od_, oy = (i * 5) % 12 + 1, (i * 3) % 28 + 1, 2015 + (i % 3)
    sm, sd_ = om % 12 + 1, (od_ + 4) % 28 + 1
    order_date = f"{om:02d}/{od_:02d}/{oy}"
    ship_date = f"{sm:02d}/{sd_:02d}/{oy}"
    units = 50 + (i * 37) % 9000
    price = round(5 + ((i * 13) % 2000) / 100.0, 2)
    cost = round(3 + ((i * 11) % 1500) / 100.0, 2)
    revenue = round(units * price, 2)
    total_cost = round(units * cost, 2)
    profit = round(revenue - total_cost, 2)
    return (f"{uuid},{country},{item},{channel},{prio},{order_date},"
            f"{REGIONS[(i * 2) % len(REGIONS)]},{ship_date},{units},"
            f"{price:.2f},{cost:.2f},{revenue:.2f},{total_cost:.2f},{profit:.2f}")


def main() -> None:
    out = os.path.join(os.path.dirname(__file__), "..", "fixtures", "sales_data_500.csv")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        f.write(HEADER + "\n")
        for i in range(500):
            f.write(row(i) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
