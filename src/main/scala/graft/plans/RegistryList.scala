package graft.plans

/** Dev/user utility: list every SQL function the engine registers on
  * top of stock Spark — name + usage line, alphabetical — so a migrant
  * can grep the surface without reading the registry source
  * (`sbt "runMain graft.plans.RegistryList"`). Ends with the count the
  * docs cite.
  */
object RegistryList {
  def main(args: Array[String]): Unit = {
    val fns = new GraftExtensions().functions
      .map { case (id, inf, _) => (id.funcName, inf.getUsage) }
      .sortBy(_._1)
    fns.foreach { case (n, u) => println(s"$n\t$u") }
    println(s"-- ${fns.size} registered functions")
  }
}
